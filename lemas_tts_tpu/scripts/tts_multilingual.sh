#!/usr/bin/env bash
# Canonical zero-shot TTS invocations (reference tts_multilingual.sh:16-53):
# multilingual GRL model, NFE 64 / CFG 5.0 / sway 3.0 / per-token lang tags.
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
PRETRAINED="${LEMAS_PRETRAINED_ROOT:-$ROOT/pretrained_models}"
CKPT="${CKPT:-$PRETRAINED/ckpts/multilingual_grl/model_last.safetensors}"
VOCAB="${VOCAB:-$PRETRAINED/data/multilingual_grl/vocab.txt}"
OUT="${OUT:-$ROOT/outputs}"
mkdir -p "$OUT"

# Spanish reference voice → Chinese speech
python -m lemas_tts_tpu.scripts.tts_multilingual \
  --model multilingual \
  --ckpt_file "$CKPT" \
  --vocab_file "$VOCAB" \
  --ref_audio "$PRETRAINED/examples/es_ref.wav" \
  --ref_text "hola, ¿cómo estás hoy?" \
  --text "今天的天气真不错，我们一起去公园散步吧。" \
  --output_wave "$OUT/es_to_zh.wav" \
  --nfe_step 64 --cfg_strength 5.0 --sway_sampling_coef 3.0 \
  --separate_langs

# Portuguese reference voice → English speech, with UVR5 denoising
python -m lemas_tts_tpu.scripts.tts_multilingual \
  --model multilingual \
  --ckpt_file "$CKPT" \
  --vocab_file "$VOCAB" \
  --ref_audio "$PRETRAINED/examples/pt_ref.wav" \
  --ref_text "olá, tudo bem com você?" \
  --text "The quick brown fox jumps over the lazy dog." \
  --output_wave "$OUT/pt_to_en.wav" \
  --nfe_step 64 --cfg_strength 5.0 --sway_sampling_coef 3.0 \
  --separate_langs \
  --denoise --uvr5_model "$PRETRAINED/uvr5/Kim_Vocal_1.onnx"
