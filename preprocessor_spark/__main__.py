"""``python -m preprocessor_spark`` → the CLI (reference EP1/EP2)."""
import sys

from preprocessor_spark.cli import main

sys.exit(main())
