"""`python -m quiver_spark` — CLI entry point (see quiver_spark.tools)."""

import sys

from quiver_spark.tools import main

sys.exit(main())
