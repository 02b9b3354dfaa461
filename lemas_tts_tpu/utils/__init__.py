from lemas_tts_tpu.utils.masks import (
    lens_to_mask,
    mask_from_start_end_indices,
    mask_from_frac_lengths,
)
from lemas_tts_tpu.utils.vocab import (
    Vocab,
    load_vocab,
    get_tokenizer,
    text_to_ids,
    pad_text_batch,
)

__all__ = [
    "lens_to_mask",
    "mask_from_start_end_indices",
    "mask_from_frac_lengths",
    "Vocab",
    "load_vocab",
    "get_tokenizer",
    "text_to_ids",
    "pad_text_batch",
]
