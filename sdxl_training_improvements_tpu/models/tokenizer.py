"""Tokenization for the dual CLIP encoders.

The reference tokenizes with the two HF CLIP tokenizers shipped inside the
SDXL checkpoint (``src/models/encoders/clip.py:61-68``: pad to max_length=77,
truncate).  Here:

* ``load_tokenizers(model_dir)`` loads ``tokenizer/`` + ``tokenizer_2/`` from
  a diffusers-layout checkpoint via transformers (pure file access — no hub
  download);
* ``HashTokenizer`` is a deterministic offline fallback (tests, synthetic
  data): whitespace tokens hashed into the vocab range with BOS/EOS/pad
  conventions matching CLIP (bos=start, eos after last token, pad after) so
  EOS-pooling works identically.
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np


class HashTokenizer:
    """Deterministic stand-in with CLIP-style special-token layout."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bos_id = vocab_size - 2  # 49406
        self.eos_id = vocab_size - 1  # 49407 (highest id -> argmax pooling)

    def __call__(self, captions: Sequence[str]) -> np.ndarray:
        import zlib  # stable across processes (hash() is per-process salted)
        out = np.full((len(captions), self.max_length), self.eos_id,
                      dtype=np.int32)
        for b, caption in enumerate(captions):
            ids = [self.bos_id]
            for tok in caption.lower().split():
                ids.append(zlib.crc32(tok.encode()) % (self.vocab_size - 3))
                if len(ids) >= self.max_length - 1:
                    break
            ids.append(self.eos_id)
            out[b, :len(ids)] = ids
            # CLIP pads with eos-equivalent; argmax finds the FIRST max —
            # i.e. the true eos position — so pooling matches HF semantics
        return out


class HFTokenizer:
    """transformers CLIPTokenizer wrapper (local files only)."""

    def __init__(self, tokenizer, max_length: int = 77):
        self.tokenizer = tokenizer
        self.max_length = max_length

    def __call__(self, captions: Sequence[str]) -> np.ndarray:
        enc = self.tokenizer(list(captions), padding="max_length",
                             max_length=self.max_length, truncation=True,
                             return_tensors="np")
        return enc["input_ids"].astype(np.int32)


class TokenizerPair:
    """(tokenizer, tokenizer_2) -> (ids_l, ids_g) [B, 77] each."""

    def __init__(self, tok_l, tok_g):
        self.tok_l = tok_l
        self.tok_g = tok_g

    def __call__(self, captions: Sequence[str]
                 ) -> Tuple[np.ndarray, np.ndarray]:
        return self.tok_l(captions), self.tok_g(captions)

    @classmethod
    def fallback(cls, vocab_size: int = 49408, max_length: int = 77
                 ) -> "TokenizerPair":
        t = HashTokenizer(vocab_size, max_length)
        return cls(t, t)


def load_tokenizers(model_dir, max_length: int = 77,
                    single_encoder: bool = False,
                    fallback_vocab_size: int = 49408) -> TokenizerPair:
    """Load from a diffusers checkpoint dir.

    ``single_encoder=True`` is the SDXL-refiner layout (CLIP-G only):
    ``tokenizer_2/`` is the one real tokenizer and fills both slots of the
    pair (the L slot's ids are computed but ignored by ``encode_g``);
    ``tokenizer/`` must then be ABSENT — its presence signals the caller
    mis-detected the checkpoint family.

    Fallback policy: the HashTokenizer stand-in is only acceptable when the
    checkpoint simply has no tokenizer directories (from-scratch runs).
    A tokenizer dir that EXISTS but fails to load raises — silently hashing
    captions against pretrained CLIP embeddings would train on garbage ids
    while the loss looks perfectly normal.
    """
    import logging
    model_dir = Path(model_dir)
    dirs = [model_dir / "tokenizer", model_dir / "tokenizer_2"]
    exists = [d.exists() for d in dirs]
    if single_encoder:
        if exists[0]:
            raise FileNotFoundError(
                f"checkpoint at {model_dir} has tokenizer/ but was detected "
                "as a single-encoder (refiner) checkpoint — layout mismatch")
        if not exists[1]:
            logging.getLogger(__name__).warning(
                "no tokenizer_2/ under %s - using the hash tokenizer "
                "stand-in (fine for random-init runs, WRONG for pretrained "
                "CLIP weights)", model_dir)
            return TokenizerPair.fallback(vocab_size=fallback_vocab_size,
                                          max_length=max_length)
        tok_g = _load_one(dirs[1], max_length)
        return TokenizerPair(tok_g, tok_g)
    if any(exists) and not all(exists):
        # partial/corrupt checkpoint: one tokenizer present, the other
        # missing.  Falling back to hashed ids for BOTH would train
        # pretrained CLIP weights on garbage with a normal-looking loss —
        # exactly what the policy above forbids.
        missing = dirs[exists.index(False)]
        raise FileNotFoundError(
            f"checkpoint at {model_dir} has {dirs[exists.index(True)].name}/ "
            f"but no {missing.name}/ — a partial or corrupt checkpoint. "
            "Restore both tokenizer directories (or remove both to opt into "
            "the hash-tokenizer stand-in for from-scratch runs).")
    if not any(exists):
        logging.getLogger(__name__).warning(
            "no tokenizer/ + tokenizer_2/ under %s - using the hash "
            "tokenizer stand-in (fine for random-init runs, WRONG for "
            "pretrained CLIP weights)", model_dir)
        return TokenizerPair.fallback(vocab_size=fallback_vocab_size,
                                      max_length=max_length)
    return TokenizerPair(*[_load_one(d, max_length) for d in dirs])


def _load_one(d: Path, max_length: int) -> HFTokenizer:
    from transformers import CLIPTokenizer, CLIPTokenizerFast
    try:
        tok = CLIPTokenizerFast.from_pretrained(str(d))
    except Exception:
        tok = CLIPTokenizer.from_pretrained(str(d))  # raises loudly
    return HFTokenizer(tok, max_length)
