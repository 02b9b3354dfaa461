"""Streaming HTTP client for the /tts_stream endpoint.

Start a server first:

    python -m lemas_tts_tpu.scripts.serve_http --port 8080 \
        --ckpt_file ... --vocab_file ...

then stream a long utterance and watch chunks arrive incrementally:

    python examples/streaming_client.py --url http://127.0.0.1:8080 \
        --ref ref.wav --ref_text "..." --text "..." --out out.wav
"""

from __future__ import annotations

import argparse
import base64
import json
import sys
import time
import urllib.request


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8080")
    p.add_argument("--ref", required=True, help="reference WAV path")
    p.add_argument("--ref_text", default="")
    p.add_argument("--text", required=True)
    p.add_argument("--out", default="out.wav")
    p.add_argument("--max_chars", type=int, default=135)
    args = p.parse_args()

    payload = {
        "ref_b64": base64.b64encode(open(args.ref, "rb").read()).decode(),
        "ref_text": args.ref_text,
        "text": args.text,
        "max_chars": args.max_chars,
    }
    req = urllib.request.Request(
        args.url + "/tts_stream", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    t0 = time.time()
    pcm = bytearray()
    with urllib.request.urlopen(req) as r:
        ctype = r.headers.get("Content-Type", "")
        rate = int(ctype.split("rate=")[1].split(";")[0]) if "rate=" in ctype else 24000
        first = None
        while True:
            block = r.read(32768)  # urllib de-chunks transparently
            if not block:
                break
            if first is None:
                first = time.time() - t0
                print(f"first audio after {first:.2f}s")
            pcm.extend(block)
    total = time.time() - t0
    secs = len(pcm) / 2 / rate
    ttfa = f"{first:.2f}s" if first is not None else "n/a (empty stream)"
    print(f"{secs:.2f}s of audio in {total:.2f}s (time-to-first-audio {ttfa})")

    import wave

    with wave.open(args.out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(pcm))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
