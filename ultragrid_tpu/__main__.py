import sys

from ultragrid_tpu.cli import main

sys.exit(main())
