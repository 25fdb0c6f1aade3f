#!/usr/bin/env python3
"""Prover fleet watchdog — parity with reference check_prover_status.py.

Polls `dbtool --check_prover_status` counts; when progress stalls while
unfinished work remains, relaunches `prover --rerun` (up to --max-retries).
Reference behavior: 60s poll / 8min stall window / 3 retries
(check_prover_status.py:21-59).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def get_counts(config: str) -> dict:
    from zkpos_tpu.services.config import load_config
    from zkpos_tpu.services.dbtool import DbTool
    return DbTool(load_config(config)).check_prover_status()


def main(argv=None):
    ap = argparse.ArgumentParser("zkpos-watchdog")
    ap.add_argument("--config", default="config/config.json")
    ap.add_argument("--poll-secs", type=float, default=60.0)
    ap.add_argument("--stall-secs", type=float, default=480.0)
    ap.add_argument("--max-retries", type=int, default=3)
    args = ap.parse_args(argv)

    retries = 0
    last_finished = -1
    last_progress_t = time.monotonic()
    while True:
        counts = get_counts(args.config)
        unfinished = counts["published"] + counts["received"]
        print(f"watchdog: {counts}")
        if unfinished == 0:
            print("watchdog: all work finished")
            return 0
        if counts["finished"] > last_finished:
            last_finished = counts["finished"]
            last_progress_t = time.monotonic()
        elif time.monotonic() - last_progress_t > args.stall_secs:
            if retries >= args.max_retries:
                print("watchdog: retries exhausted", file=sys.stderr)
                return 1
            retries += 1
            print(f"watchdog: stalled, launching prover --rerun "
                  f"(retry {retries}/{args.max_retries})")
            subprocess.run([sys.executable, "-m",
                            "zkpos_tpu.services.prover",
                            "--config", args.config, "--rerun"], check=False)
            last_progress_t = time.monotonic()
        time.sleep(args.poll_secs)


if __name__ == "__main__":
    sys.exit(main())
