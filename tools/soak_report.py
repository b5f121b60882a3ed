"""Summarize a tools/soak_train.py log into the TRAINRUN.md tables.

Parses the epoch-stamped human-format dumps ([ts] | key | value |) into
per-window rows: step, wall since start, windowed steps/s (from
successive dump timestamps — the cumulative steps/sec the loop logs
hides late-run degradation), loss, grad_norm, nonfinite_skips.

    python tools/soak_report.py /tmp/soak_run.log
"""

import re
import sys

ROW = re.compile(r"^\[(\d+\.\d)\] \| (\S+)\s*\| ([^|]+)\|")


def parse(path):
    dumps = []
    cur = {}
    cur_ts = None
    for line in open(path):
        m = ROW.match(line)
        if not m:
            if cur and "step" in cur:
                dumps.append((cur_ts, cur))
            cur, cur_ts = {}, None
            continue
        cur_ts = float(m.group(1))
        cur[m.group(2)] = m.group(3).strip()
    if cur and "step" in cur:
        dumps.append((cur_ts, cur))
    return dumps


def main(path):
    dumps = parse(path)
    if not dumps:
        print("no dumps parsed"); return
    t0 = dumps[0][0]
    print("| step | wall (min) | windowed steps/s | loss | grad_norm "
          "| nonfinite_skips |")
    print("|---|---|---|---|---|---|")
    prev_ts, prev_step = None, None
    for ts, kv in dumps:
        step = int(float(kv["step"]))
        rate = ""
        if prev_ts is not None and ts > prev_ts:
            rate = f"{(step - prev_step) / (ts - prev_ts):.3f}"
        print(f"| {step} | {(ts - t0) / 60:.1f} | {rate} "
              f"| {kv.get('loss', '')} | {kv.get('grad_norm', '')} "
              f"| {kv.get('nonfinite_skips', '0')} |")
        prev_ts, prev_step = ts, step

    rates = []
    prev = None
    for ts, kv in dumps:
        step = int(float(kv["step"]))
        if prev and ts > prev[0]:
            rates.append((step - prev[1]) / (ts - prev[0]))
        prev = (ts, step)
    if len(rates) >= 4:
        half = len(rates) // 2
        a = sum(rates[:half]) / half
        b = sum(rates[half:]) / (len(rates) - half)
        print(f"\nfirst-half mean {a:.3f} steps/s vs second-half mean "
              f"{b:.3f} steps/s ({(b / a - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_run.log")
