#!/usr/bin/env python
"""Reference-compatible CLI (run_ontoemma.py analog — see
ontoemma_spark/cli.py for the option surface).

    python scripts/run_ontoemma.py -s source.json -t target.obo \
        -o out.tsv -i gold.tsv -p lr -a best
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontoemma_spark.cli import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
