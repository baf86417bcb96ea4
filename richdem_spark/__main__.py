"""``python -m richdem_spark`` — the apps/rd_* CLI (see cli.py)."""

import sys

from .cli import main

sys.exit(main())
