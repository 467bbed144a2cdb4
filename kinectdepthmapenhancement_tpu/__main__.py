from kinectdepthmapenhancement_tpu.cli import main

raise SystemExit(main())
