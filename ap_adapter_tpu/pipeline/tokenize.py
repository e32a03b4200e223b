"""Host-side prompt tokenization.

The reference tokenizes with RobertaTokenizer (CLAP, padded to max_length)
and T5Tokenizer (padded to longest) — pipeline_audioldm2.py:380-399. Real
vocab files come with the converted checkpoint; in hermetic environments a
deterministic hash tokenizer keeps the pipeline runnable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ap_adapter_tpu.configs import PipelineConfig
from ap_adapter_tpu.pipeline.pipeline import TextBatch


class HashTokenizer:
    """Deterministic word-hash tokenizer (fallback when no vocab files).

    NOT a linguistic tokenizer — it exists so smoke tests / benchmarks can
    drive the full pipeline with stable ids. bos=0, eos=2, pad=1.
    """

    def __init__(self, vocab_size: int, pad_token_id: int = 1):
        self.vocab_size = vocab_size
        self.pad_token_id = pad_token_id

    def __call__(self, texts: Sequence[str], max_length: int) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.full((len(texts), max_length), self.pad_token_id, dtype=np.int32)
        mask = np.zeros((len(texts), max_length), dtype=np.int32)
        for i, t in enumerate(texts):
            toks = [0]
            for w in t.lower().split():
                h = int(hashlib.md5(w.encode()).hexdigest(), 16)
                toks.append(3 + h % (self.vocab_size - 3))
            toks.append(2)
            toks = toks[:max_length]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask


class HFTokenizers:
    """transformers tokenizers loaded from a local checkpoint directory."""

    def __init__(self, checkpoint_dir: str):
        from transformers import AutoTokenizer

        self.clap = AutoTokenizer.from_pretrained(f"{checkpoint_dir}/tokenizer")
        self.t5 = AutoTokenizer.from_pretrained(f"{checkpoint_dir}/tokenizer_2")

    def __call__(self, texts, clap_max_length: int, t5_max_length: Optional[int] = None):
        clap = self.clap(
            list(texts), padding="max_length", max_length=clap_max_length,
            truncation=True, return_tensors="np",
        )
        t5 = self.t5(
            list(texts),
            padding="max_length" if t5_max_length else True,
            max_length=t5_max_length, truncation=True, return_tensors="np",
        )
        return clap.input_ids, clap.attention_mask, t5.input_ids, t5.attention_mask

    def t5_length(self, texts) -> int:
        """Longest T5 token length over ``texts`` (no padding)."""

        return max(len(ids) for ids in self.t5(list(texts)).input_ids)


T5_BUCKETS = (16, 32, 64, 128, 256, 512)


def pick_t5_bucket(longest: int, buckets: Sequence[int] = T5_BUCKETS) -> int:
    """Smallest bucket >= the longest tokenized prompt.

    The reference pads T5 to longest-per-batch (pipeline_audioldm2.py:
    380-399) — a dynamic shape. Bucketing keeps one compiled executable per
    bucket while matching the reference's semantics (padding is masked)."""

    for b in buckets:
        if longest <= b:
            return b
    return buckets[-1]


def make_text_batch(
    config: PipelineConfig,
    prompts: Sequence[str],
    tokenizers: Optional[HFTokenizers] = None,
    clap_len: Optional[int] = None,
    t5_len: Optional[int] = 64,
) -> TextBatch:
    """Tokenize prompts into a fixed-shape TextBatch.

    The reference pads CLAP to the tokenizer max (512) and T5 to longest; we
    bucket T5 to ``t5_len`` to keep one compiled executable per task shape.
    ``t5_len=None`` auto-buckets to the smallest T5_BUCKETS entry covering
    the longest prompt.
    """

    clap_len = clap_len or config.clap.max_length
    if t5_len is None:
        if tokenizers is not None:
            t5_len = pick_t5_bucket(tokenizers.t5_length(prompts))
        else:
            t5_len = pick_t5_bucket(max(len(t.split()) + 2 for t in prompts))
    if tokenizers is not None:
        ci, cm, ti, tm = tokenizers(prompts, clap_len, t5_len)
    else:
        ci, cm = HashTokenizer(config.clap.vocab_size, config.clap.pad_token_id)(prompts, clap_len)
        ti, tm = HashTokenizer(config.t5.vocab_size, pad_token_id=0)(prompts, t5_len)
    return TextBatch(
        clap_ids=jnp.asarray(ci, jnp.int32),
        clap_mask=jnp.asarray(cm, jnp.int32),
        t5_ids=jnp.asarray(ti, jnp.int32),
        t5_mask=jnp.asarray(tm, jnp.int32),
    )
