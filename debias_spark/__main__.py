"""`python -m debias_spark` — delegates to the CLI runner."""

import sys

from debias_spark.cli import main

sys.exit(main())
