from raysnail_tpu.cli import main

raise SystemExit(main())
