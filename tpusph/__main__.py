from tpusph.cli import main

raise SystemExit(main())
