"""Serving layer: continuous-batching engine + web UI.

Replaces the reference's per-request model rebuild (``inference_gradio.py:253-350``,
flagged as an anti-pattern in SURVEY.md §3.4) with a long-lived engine: one
jitted program cache, a native micro-batching scheduler coalescing concurrent
requests, and structured metrics.
"""

from lemas_tts_tpu.serve.engine import ServingEngine, TTSRequest

__all__ = ["ServingEngine", "TTSRequest"]
