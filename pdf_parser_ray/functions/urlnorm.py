"""URL canonicalization (RFC 3986 normalization + tracking-param strip).

A web-crawl corpus carries the same page under many URL spellings —
scheme/host case, default ports, dot segments, fragments, tracking
parameters, query-order jitter. Canonicalizing before URL-keyed dedup is
the first hygiene pass of every crawl pipeline (no reference analog;
part of the training-data brief). Pure function, stdlib only, total over
garbage (an unparseable URL canonicalizes to itself stripped of
surrounding whitespace).

Rules (RFC 3986 §6 syntax-based normalization + the conventional
crawl-side extensions):
  - scheme and host lowercase; default ports dropped (http:80, https:443)
  - fragment removed
  - path dot-segments resolved; empty path -> "/"; percent-escapes
    uppercased, unreserved characters un-escaped
  - query: tracking parameters dropped (utm_*, fbclid, gclid, msclkid,
    mc_cid, mc_eid, igshid, _ga), remaining pairs sorted by (key, value)
    for order-insensitivity, re-encoded minimally
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, quote, unquote, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_RE = re.compile(
    r"^(?:utm_\w+|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|_ga)$", re.I)
# characters never escaped in a canonical path (RFC 3986 unreserved + /)
_PATH_SAFE = "/-._~!$&'()*+,;=:@"
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")


def _norm_pct(s: str) -> str:
    """RFC 3986 §6.2.2.1-2: decode escapes of UNRESERVED characters,
    uppercase the hex of every other escape — escaped reserved
    characters (%2F etc.) stay escaped, because decoding them changes
    which component delimiter they are."""
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _canon_path(path: str) -> str:
    if not path:
        return "/"
    # RFC 3986 §6.2.2 ordering: normalize percent-escapes FIRST (so
    # '%2e%2e' is a real dot segment by the time segments resolve),
    # then remove dot segments
    path = _norm_pct(path)
    # resolve dot segments (RFC 3986 §5.2.4), preserving a trailing slash
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
            continue
        out.append(seg)
    resolved = "/".join(out)
    if path.endswith(("/.", "/..")) and not resolved.endswith("/"):
        resolved += "/"
    if not resolved.startswith("/"):
        resolved = "/" + resolved
    # escapes were normalized before segment removal; quote raw
    # out-of-set characters ('%' kept safe so existing escapes never
    # double-encode)
    return quote(resolved, safe=_PATH_SAFE + "%")


def canonical_url(url: str) -> str:
    """One canonical spelling per logical URL; see module rules."""
    raw = (url or "").strip()
    try:
        parts = urlsplit(raw)
    except ValueError:
        return raw
    if not parts.scheme or not parts.netloc:
        return raw
    scheme = parts.scheme.lower()
    host = parts.hostname or ""
    try:
        port = parts.port
    except ValueError:
        port = None
    # parts.hostname strips IPv6 brackets; restore them or the
    # reassembled netloc is invalid AND distinct hosts can collide
    # (['::1]:80' vs '[::1:80]' — review catch)
    netloc = f"[{host.lower()}]" if ":" in host else host.lower()
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{netloc}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password
                                 else "")
        netloc = f"{cred}@{netloc}"
    pairs = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
             if not _TRACKING_RE.match(k)]
    query = urlencode(sorted(pairs))
    return urlunsplit((scheme, netloc, _canon_path(parts.path), query, ""))
