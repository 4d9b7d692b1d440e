"""Canonical-URL normalization + URL dedup: unit rules, stage
correctness on a crafted corpus, forced-gate parity, CLI front door."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pytest

from pdf_parser_ray.functions.urlnorm import canonical_url


class TestCanonicalUrl:
    CASES = [
        # scheme/host case, default ports
        ("HTTP://Example.COM/a", "http://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        # fragment stripped
        ("https://x.org/p#section-2", "https://x.org/p"),
        # dot segments
        ("https://x.org/a/b/../c/./d", "https://x.org/a/c/d"),
        ("https://x.org/a/..", "https://x.org/"),
        ("https://x.org", "https://x.org/"),
        # trailing slash preserved
        ("https://x.org/a/", "https://x.org/a/"),
        # percent normalization: unreserved unescaped, escapes uppercased
        ("https://x.org/%7Euser/%2fpath", "https://x.org/~user/%2Fpath"),
        # tracking params dropped; remaining sorted
        ("https://x.org/p?utm_source=tw&b=2&a=1&fbclid=XYZ",
         "https://x.org/p?a=1&b=2"),
        ("https://x.org/p?gclid=1&UTM_CAMPAIGN=x", "https://x.org/p"),
        # blank values survive; pair order canonical
        ("https://x.org/p?z=&a=", "https://x.org/p?a=&z="),
        # userinfo preserved
        ("https://u:pw@X.org/a", "https://u:pw@x.org/a"),
        # garbage is total
        ("", ""),
        ("not a url", "not a url"),
        ("  https://x.org/a  ", "https://x.org/a"),
    ]

    def test_cases(self):
        for raw, want in self.CASES:
            assert canonical_url(raw) == want, raw

    def test_idempotent(self):
        for raw, _ in self.CASES:
            c = canonical_url(raw)
            assert canonical_url(c) == c, raw


def _corpus():
    # three logical pages, several spellings each, plus singletons
    urls = [
        "https://x.org/a?utm_source=tw",       # group A
        "HTTPS://X.ORG/a",                     # group A (dup)
        "https://x.org:443/a#frag",            # group A (dup)
        "https://x.org/b/../b2",               # group B
        "https://x.org/b2",                    # group B (dup)
        "https://x.org/only",                  # singleton
        "https://y.org/q?b=2&a=1",             # group C
        "https://y.org/q?a=1&b=2",             # group C (dup)
        "https://y.org/q?a=1&b=3",             # singleton (different query)
    ]
    return pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array([dt.datetime(2024, 1, 1, 0, 0, i)
                             for i in range(len(urls))],
                            pa.timestamp("us")),
        "html": pa.array([f"<p>{u}</p>".encode() for u in urls],
                         pa.binary()),
    })


@pytest.mark.usefixtures("ray_session")
class TestUrlDedupStage:
    def _run(self, broadcast_max):
        import ray.data

        from pdf_parser_ray.stages.dedup import url_dedup

        ds = ray.data.from_arrow(_corpus()).repartition(3)
        out = url_dedup(ds, broadcast_max=broadcast_max).to_pandas()
        return out.sort_values("url").reset_index(drop=True)

    def test_keeps_one_per_canonical_group(self):
        # groups: A x3 -> 1, B x2 -> 1, C x2 -> 1, singletons x2 -> 5 kept
        out = self._run(broadcast_max=10**9)
        assert len(out) == 5
        # keeper = lexicographically smallest raw spelling
        assert sorted(out["url"].tolist()) == [
            "HTTPS://X.ORG/a", "https://x.org/b/../b2",
            "https://x.org/only", "https://y.org/q?a=1&b=2",
            "https://y.org/q?a=1&b=3"]
        # full original schema preserved
        assert set(out.columns) == {"url", "warc_ts", "html"}

    def test_forced_join_path_matches_broadcast(self):
        a = self._run(broadcast_max=10**9)
        b = self._run(broadcast_max=0)
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)

    def test_no_dups_is_identity(self):
        import ray.data

        from pdf_parser_ray.stages.dedup import url_dedup

        tbl = pa.table({"url": pa.array(["https://x.org/1",
                                         "https://x.org/2"]),
                        "v": pa.array([1, 2], pa.int64())})
        out = url_dedup(ray.data.from_arrow(tbl)).to_pandas()
        assert len(out) == 2


@pytest.mark.usefixtures("ray_session")
class TestCli:
    def test_urldedup_cli(self, tmp_path, capsys):
        import json

        import pyarrow.parquet as pq

        from pdf_parser_ray.cli import main

        src = str(tmp_path / "pages.parquet")
        pq.write_table(_corpus(), src)
        out = str(tmp_path / "kept")
        assert main(["urldedup", src, "-o", out]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep == {"rows_in": 9, "rows_out": 5, "removed": 4,
                       "url_column": "url"}


class TestCanonicalFuzz:
    """Property tests: canonicalization is total and idempotent over
    arbitrary URL-shaped strings (the fixpoint property is what makes
    the dedup key stable — a second pass must never re-split groups)."""

    def test_idempotent_over_random_urls(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        seg = st.text(
            alphabet="abcXYZ019-._~%2F/?&=#:@ ", min_size=0, max_size=12)

        @settings(max_examples=300, deadline=None)
        @given(scheme=st.sampled_from(["http", "https", "HTTP"]),
               host=st.sampled_from(
                   ["Example.com", "x.org:8080", "x.org:443", "a.b.C.de"]),
               path=seg, query=seg, frag=seg)
        def prop(scheme, host, path, query, frag):
            raw = f"{scheme}://{host}/{path}?{query}#{frag}"
            c1 = canonical_url(raw)
            c2 = canonical_url(c1)
            assert c2 == c1, (raw, c1, c2)

        prop()

    def test_total_over_garbage(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(raw=st.text(max_size=40))
        def prop(raw):
            out = canonical_url(raw)
            assert isinstance(out, str)
            assert canonical_url(out) == out

        prop()


class TestReviewCatches:
    """Round-5 self-review regressions (each reproduced before fixing)."""

    def test_pct_dot_segments_resolve(self):
        # %2e%2e must resolve as a dot segment (RFC 3986 §6.2.2 ordering)
        assert canonical_url("http://h/a/%2e%2e/b") == "http://h/b"
        assert canonical_url("http://h/%2e/a") == "http://h/a"
        c = canonical_url("http://h/a/%2e%2e/b")
        assert canonical_url(c) == c

    def test_warc_negative_content_length_terminates(self):
        from pdf_parser_ray.sources.warc import parse_warc_bytes

        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Target-URI: https://x.org/a\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
               b"Content-Length: -1000\r\n\r\nxxxx\r\n\r\n")
        good = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: https://x.org/b\r\n"
                b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
                b"Content-Type: text/html\r\n"
                b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
        recs = parse_warc_bytes(bad + good)  # must not hang
        assert [r["url"] for r in recs] == ["https://x.org/b"]

    def test_synth_warc_shard_count_exact(self, tmp_path):
        import os

        from pdf_parser_ray.cli import main

        out = str(tmp_path / "w")
        assert main(["synth", "10", "-o", out, "--format", "warc",
                     "--warc-shards", "4"]) == 0
        assert len(os.listdir(out)) == 4

    def test_attach_dim_accepts_left_outer_spelling(self):
        import pdf_parser_ray.pipelines.relational as rel
        import ray.data

        fact = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2], pa.int64())}))
        dim = ray.data.from_arrow(pa.table({
            "k": pa.array([1], pa.int64()),
            "v": pa.array([9], pa.int64())}))
        fs = pa.schema([("k", pa.int64())])
        ds_ = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        for how in ("left", "left_outer"):
            out = rel.attach_dim(fact, dim, on="k", dim_count=1,
                                 fact_schema=fs, dim_schema=ds_,
                                 how=how).to_pandas()
            assert len(out) == 2

    def test_checkpoint_fingerprint_ignores_default_flags(self):
        from pdf_parser_ray.state.checkpoint import _config_fingerprint

        base = {"want_markdown": True, "explode_threshold": None}
        with_new_flags = base | {"detect_lang": False,
                                 "quality_signals": False}
        fp = lambda kw: _config_fingerprint(
            {k: v for k, v in kw.items()
             if v is not None and v is not False} | {"v": 1})
        assert fp(base) == fp(with_new_flags)
        assert fp(base) != fp(base | {"detect_lang": True})


@pytest.mark.usefixtures("ray_session")
class TestExactSpellingDuplicates:
    @pytest.mark.parametrize("bmax", [10**9, 0])
    def test_identical_spellings_collapse_to_one(self, bmax):
        import ray.data

        from pdf_parser_ray.stages.dedup import url_dedup

        tbl = pa.table({
            "url": pa.array(["http://a.com/", "http://a.com/",
                             "http://a.com/?utm_source=x",
                             "http://b.com/"]),
            "v": pa.array([1, 2, 3, 4], pa.int64())})
        out = url_dedup(ray.data.from_arrow(tbl).repartition(2),
                        broadcast_max=bmax).to_pandas()
        assert sorted(out["url"].tolist()) == ["http://a.com/",
                                               "http://b.com/"]
        # deterministic pick: min stringified row -> v == 1
        assert out[out["url"] == "http://a.com/"]["v"].iloc[0] == 1


class TestReviewCatches2:
    def test_ipv6_brackets_preserved(self):
        assert canonical_url("http://[2001:db8::1]:8443/a") == \
            "http://[2001:db8::1]:8443/a"
        assert canonical_url("HTTP://[2001:DB8::1]/a") == \
            "http://[2001:db8::1]/a"
        # distinct hosts stay distinct
        a = canonical_url("http://[2001:db8::1]:8443/a")
        b = canonical_url("http://[2001:db8::1:8443]/a")
        assert a != b


@pytest.mark.usefixtures("ray_session")
class TestNullUrlGateParity:
    @pytest.mark.parametrize("bmax", [10**9, 0])
    def test_null_url_group_keeps_one_on_both_paths(self, bmax):
        import ray.data

        from pdf_parser_ray.stages.dedup import url_dedup

        tbl = pa.table({
            "url": pa.array([None, None, "https://x.org/a"], pa.string()),
            "v": pa.array([1, 2, 3], pa.int64())})
        out = url_dedup(ray.data.from_arrow(tbl).repartition(2),
                        broadcast_max=bmax).to_pandas()
        assert sorted(out["v"].tolist()) == [1, 3]
