"""Fake scheduler job: records (device, start, end) to a JSON file.

Usage: python -m tests.fake_job <outfile> <duration_s> [exit_code]
The scheduler exports CDR_DEVICE; this records the observed placement
window so tests can assert per-device / per-type concurrency caps.
"""

import json
import os
import pathlib
import sys
import time

out = pathlib.Path(sys.argv[1])
duration = float(sys.argv[2])
rc = int(sys.argv[3]) if len(sys.argv) > 3 else 0
start = time.monotonic()
time.sleep(duration)
out.parent.mkdir(parents=True, exist_ok=True)
out.write_text(json.dumps({
    "device": os.environ.get("CDR_DEVICE"),
    "start": start,
    "end": time.monotonic(),
    "pid": os.getpid(),
}))
sys.exit(rc)
