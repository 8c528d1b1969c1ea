import sys

from nemo_spark.cli import main

sys.exit(main())
