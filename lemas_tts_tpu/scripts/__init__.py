"""Command-line entry points (reference ``lemas_tts/scripts/``):

 - ``tts_multilingual``     — zero-shot multilingual TTS
 - ``speech_edit_multilingual`` — alignment-JSON-driven speech editing
 - ``inference_gradio``     — web serving UI

Run as modules: ``python -m lemas_tts_tpu.scripts.tts_multilingual --help``.
"""
