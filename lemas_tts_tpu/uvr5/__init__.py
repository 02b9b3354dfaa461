"""UVR5 vocal-separation / denoising subsystem (MDX-Net) — TPU-native.

Replaces the reference's ONNX-Runtime side-car (``uvr5/multiprocess_cuda_infer.py``)
with a JAX re-implementation of the MDX-Net ``ConvTDFNet`` graph
(``uvr5/lib_v5/mdxnet.py:34-124``), fed by the same 4-channel real-STFT
packing and chunked overlap-trim demixing. Weights convert from either the
original ``.onnx`` files (minimal built-in protobuf reader — no onnxruntime)
or torch lightning ``.ckpt`` state dicts.
"""

from lemas_tts_tpu.uvr5.inference import UVR5, MDXSeparator

__all__ = ["UVR5", "MDXSeparator"]
