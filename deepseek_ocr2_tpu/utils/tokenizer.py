"""Prompt tokenization with image placeholder expansion.

Parity with reference main.rs:1173-1226 (tokenize_with_image) and
main.rs:853-856 (text path): BOS id 0 prepended, `<image>` expanded into
N placeholder tokens (id 128815) where
N = (base/16 ceil/4)^2 + 1 + (crop/16 ceil/4)^2 * tiles_w * tiles_h.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..configs import OCR2Config


def load_tokenizer(path: str):
    from tokenizers import Tokenizer

    return Tokenizer.from_file(str(path))


def tokenize_text(tokenizer, prompt: str, bos_id: int = 0) -> List[int]:
    enc = tokenizer.encode(prompt, add_special_tokens=False)
    return [bos_id] + list(enc.ids)


def tokenize_with_image(
    tokenizer,
    prompt: str,
    cfg: OCR2Config,
    crop_ratio: Tuple[int, int] = (1, 1),
) -> Tuple[List[int], List[bool], int]:
    """Returns (ids, image_mask, image_start).

    The placeholder block is always contiguous; `image_start` is its index.
    """
    parts = prompt.split("<image>")
    if len(parts) != 2:
        raise ValueError("prompt must contain exactly one '<image>' placeholder")

    ids: List[int] = [cfg.bos_token_id]
    mask: List[bool] = [False]
    image_start = -1

    for pi, part in enumerate(parts):
        if part:
            enc = tokenizer.encode(part, add_special_tokens=False)
            ids.extend(enc.ids)
            mask.extend([False] * len(enc.ids))
        if pi == 0:
            n_img = cfg.image_token_count(crop_ratio)
            image_start = len(ids)
            ids.extend([cfg.image_token_id] * n_img)
            mask.extend([True] * n_img)

    return ids, mask, image_start


def decode_output(
    tokenizer, ids: List[int], stop_string: Optional[str] = None
) -> str:
    """Detokenize generated ids, strip the stop string, trim
    (reference main.rs:1616-1631)."""
    text = tokenizer.decode([int(i) for i in ids], skip_special_tokens=False)
    if stop_string and text.endswith(stop_string):
        text = text[: -len(stop_string)]
    return text.strip()
