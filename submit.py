#!/usr/bin/env python
"""spark-submit entry script (the package itself ships via --py-files):

    tools/package_pyfiles.sh
    spark-submit --py-files dist/pdf_ocr_api_spark.zip submit.py \
        --input <table-or-path> --output <root> --buckets 256 [--records]
"""

import sys

from pdf_ocr_api_spark.runner import main

if __name__ == "__main__":
    sys.exit(main())
