#!/usr/bin/env python
"""spark-submit entry point (north rule: "run via spark-submit
--py-files on a multi-executor cluster").

Usage:
    python scripts/make_pyfiles_zip.py /tmp/kg_pyfiles.zip
    spark-submit --master <cluster> --py-files /tmp/kg_pyfiles.zip \
        scripts/submit_run_all.py run-all --out /path/out --pages 2000

The package arrives via --py-files; this script only dispatches to the
same CLI the module entry point uses.
"""

import sys

from kbase_cdm_ontologies_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
