"""lemas-tts-tpu: a TPU-native (JAX/XLA/Pallas) multilingual zero-shot TTS framework.

Re-designed from scratch with the capabilities of the PyTorch reference
``LEMAS-Project/LEMAS-TTS`` (see SURVEY.md): an F5-style conditional-flow-matching
DiT acoustic model sampled by a jitted Euler ODE loop with classifier-free
guidance and sway time-warp, a jittable XLA mel frontend, a JAX Vocos vocoder,
a multilingual phone frontend, speech editing with span keep-masks, optional
prosody conditioning, and UVR5 reference-audio denoising.

Public API mirrors the reference package surface
(``lemas_tts/__init__.py:1-3`` exports ``TTS``).
"""

__version__ = "0.1.0"

__all__ = ["TTS", "__version__"]


def __getattr__(name):  # lazy: keep `import lemas_tts_tpu.ops` cheap (no API deps)
    if name == "TTS":
        from lemas_tts_tpu.api import TTS

        return TTS
    raise AttributeError(name)
