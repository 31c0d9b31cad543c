"""spark-submit job script:

  spark-submit --py-files hinbox_spark.zip scripts/run_pipeline.py \
      --generate 10000 --output /tmp/kg_out

Thin wrapper over hinbox_spark.__main__ so the module resolves from the
--py-files archive on every executor.
"""

import sys

from hinbox_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
