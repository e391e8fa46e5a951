from hevce_tpu.cli import main

raise SystemExit(main())
