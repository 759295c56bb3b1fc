#!/usr/bin/env python
"""Build a validate-hf transcript JSON from a debug-hook stderr log.

The reference binary (and this framework's CLI) prints HF-parity
fingerprints on stderr when the debug channels are set:

    DEEPSEEK_DEBUG_OCR=1 DEEPSEEK_DEBUG_TOPK=1 DEEPSEEK_DEBUG_TOKENS=1 \
        <reference generate-ocr ...> 2> run.log

    (reference formats: main.rs:1501-1522 inputs_embeds dumps,
     main.rs:1540-1555 step-0 top-10, main.rs:1601-1606 per-step tokens;
     runtime/pipeline.py prints the identical lines)

    python tools/transcript_from_debug_log.py run.log > transcript.json

The emitted transcript is directly consumable by
`validate-hf --expected transcript.json`: the moment real weights land, a
single reference run with the debug channels on becomes the golden parity
gate — no code changes, no shared harness required. Channels missing from
the log are simply absent from the transcript (compare_transcripts skips
them), so even a partial log (e.g. only DEEPSEEK_DEBUG_TOKENS) validates
token ids.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def _floats(s: str):
    s = s.strip()
    if s.startswith("["):
        s = s[1:]
    if s.endswith("]"):
        s = s[:-1]
    return [float(t) for t in s.split(",") if t.strip()]


def _ints(s: str):
    return [int(round(v)) for v in _floats(s)]


def parse_log(text: str) -> dict:
    out: dict = {"version": 2}
    fp: dict = {}
    positions: dict = {}
    step_ids: dict = {}

    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("debug: "):
            continue
        body = line[len("debug: ") :]

        m = re.match(r"inputs_embeds nan=(\S+) min=(\S+) max=(\S+) mean=(\S+)", body)
        if m:
            fp["stats"] = {
                "nan": int(m.group(1)),
                "min": float(m.group(2)),
                "max": float(m.group(3)),
                "mean": float(m.group(4)),
            }
            continue
        m = re.match(r"inputs_embeds fingerprint=(\[.*\])", body)
        if m:
            fp["first16"] = _floats(m.group(1))
            continue
        m = re.match(r"inputs_embeds\[pos_?(\w+)\]=(\[.*\])", body)
        if m:
            positions[m.group(1)] = _floats(m.group(2))
            continue
        m = re.match(r"step0 top10 ids=(\[.*\])", body)
        if m:
            out.setdefault("step0_top10", {})["ids"] = _ints(m.group(1))
            continue
        m = re.match(r"step0 top10 logit=(\[.*\])", body)
        if m:
            out.setdefault("step0_top10", {})["logits"] = _floats(m.group(1))
            continue
        m = re.match(r"step(\d+) next_id=(-?\d+)", body)
        if m:
            step_ids[int(m.group(1))] = int(m.group(2))
            continue
        m = re.match(r"prompt_len=(\d+) new_tokens=(\d+)", body)
        if m:
            out["prompt_len"] = int(m.group(1))
            continue

    if positions:
        fp["positions"] = positions
    if fp:
        out["inputs_embeds"] = fp
    if step_ids:
        n = max(step_ids) + 1
        missing = [i for i in range(n) if i not in step_ids]
        if missing:
            raise SystemExit(
                f"log is missing next_id lines for steps {missing[:5]}... — "
                "was DEEPSEEK_DEBUG_TOKENS set for the whole run?"
            )
        out["generated_ids"] = [step_ids[i] for i in range(n)]
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("log", help="stderr log from a debug-channel run ('-' for stdin)")
    ap.add_argument("-o", "--out", help="output path (default stdout)")
    args = ap.parse_args()
    text = sys.stdin.read() if args.log == "-" else open(args.log).read()
    transcript = parse_log(text)
    got = [k for k in ("inputs_embeds", "step0_top10", "generated_ids") if k in transcript]
    if not got:
        raise SystemExit(
            "no debug fingerprint lines found — run with DEEPSEEK_DEBUG_OCR=1 "
            "DEEPSEEK_DEBUG_TOPK=1 DEEPSEEK_DEBUG_TOKENS=1 and capture stderr"
        )
    print(f"parsed channels: {', '.join(got)}", file=sys.stderr)
    payload = json.dumps(transcript, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
    else:
        print(payload)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
