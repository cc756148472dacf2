"""``python -m big_data_imdb_classifier_spark`` → generic query CLI."""

import sys

from .cli import main

sys.exit(main())
