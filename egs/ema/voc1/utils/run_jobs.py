#!/usr/bin/env python3
"""Recipe shim — the run.pl-family launcher lives in
``articulatory_tpu.utils.run_jobs`` (one shared implementation, the way
Kaldi recipes symlink a shared utils/ tree). Kept as a real file so the
recipe dir works standalone: falls back to the repo-root path when the
package is not installed."""

import os
import sys

try:
    from articulatory_tpu.utils.run_jobs import main
except ImportError:
    sys.path.insert(0, os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "..", "..", "..")))
    from articulatory_tpu.utils.run_jobs import main

if __name__ == "__main__":
    main()
