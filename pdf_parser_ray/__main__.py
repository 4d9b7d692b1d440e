from pdf_parser_ray.cli import main

raise SystemExit(main())
