#!/usr/bin/env bash
# Canonical speech-editing invocations (reference speech_edit_multilingual.sh:21-55):
# batch-edit every wav in a directory against its alignment JSON.
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
PRETRAINED="${LEMAS_PRETRAINED_ROOT:-$ROOT/pretrained_models}"
VOCAB="${VOCAB:-$PRETRAINED/data/multilingual_grl/vocab.txt}"
WAV_DIR="${WAV_DIR:-$ROOT/edit_inputs/wavs}"
ALIGN_DIR="${ALIGN_DIR:-$ROOT/edit_inputs/align}"
OUT="${OUT:-$ROOT/outputs/edited}"

# GRL model variant
python -m lemas_tts_tpu.scripts.speech_edit_multilingual \
  --model multilingual \
  --ckpt_file "$PRETRAINED/ckpts/multilingual_grl/model_last.safetensors" \
  --vocab_file "$VOCAB" \
  --wav_dir "$WAV_DIR" --align_dir "$ALIGN_DIR" --save_dir "$OUT/grl" \
  --nfe_step 64 --cfg_strength 5.0 --sway_sampling_coef 3.0

# Prosody-encoder model variant
python -m lemas_tts_tpu.scripts.speech_edit_multilingual \
  --model multilingual_prosody \
  --ckpt_file "$PRETRAINED/ckpts/multilingual_prosody/model_last.safetensors" \
  --vocab_file "$VOCAB" \
  --enable_prosody_encoder \
  --wav_dir "$WAV_DIR" --align_dir "$ALIGN_DIR" --save_dir "$OUT/prosody" \
  --nfe_step 64 --cfg_strength 5.0 --sway_sampling_coef 3.0
