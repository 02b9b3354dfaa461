"""Model zoo: DiT / MMDiT / UNetT CFM backbones, Vocos vocoder, ECAPA-TDNN
speaker & prosody encoders, MDX-Net denoiser — all flax modules over XLA/Pallas ops."""
