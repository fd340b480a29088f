"""CLIP byte-pair tokenizer (the open_clip SimpleTokenizer format).

The reference's HPSv2 / CLIP preference scorers tokenize prompts with
open_clip's SimpleTokenizer over ``bpe_simple_vocab_16e6.txt.gz``
(ImageQualityMetric/hps.py:57, open_clip/tokenizer.py).  This is a fresh
implementation of the same standard byte-level BPE:

- byte -> printable-unicode alphabet (the GPT-2 byte encoder),
- merge ranks from the gzip'd merge list (line 0 is a header; the CLIP
  vocab uses the first 49152-256-2 merges),
- per-word BPE with a ``</w>`` end-of-word marker,
- vocab = 256 byte symbols + 256 ``</w>`` variants + merged tokens +
  ``<|startoftext|>`` / ``<|endoftext|>`` (ids 49406/49407 at full size),
- ``tokenize()`` pads/truncates to the 77-token context with SOT/EOT.

Divergence note: open_clip pipes text through ``ftfy.fix_text`` (mojibake
repair), which is not available here — we apply the same html-unescape +
whitespace cleanup and skip the mojibake pass (affects only malformed
unicode inputs).
"""

from __future__ import annotations

import functools
import gzip
import html

import numpy as np


@functools.lru_cache()
def _bytes_to_unicode():
    """GPT-2 byte encoder: every byte maps to a printable unicode char."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _pairs(word):
    return {(a, b) for a, b in zip(word[:-1], word[1:])}


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return " ".join(text.split()).strip()


class ClipBpeTokenizer:
    """SimpleTokenizer-compatible encoder over a merge-list file.

    ``bpe_path``: the gzip'd merge list (header line + "a b" merge rows).
    ``max_merges`` defaults to the CLIP vocab budget (49152 - 256 - 2).
    """

    def __init__(self, bpe_path: str, max_merges: int | None = None):
        import regex

        self.byte_encoder = _bytes_to_unicode()
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rb") as f:
            lines = f.read().decode("utf-8").split("\n")
        budget = (49152 - 256 - 2) if max_merges is None else max_merges
        merges = [tuple(m.split()) for m in lines[1:budget + 1] if m.strip()]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self._cache = {}
        self._pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", regex.IGNORECASE)

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        ids = []
        for token in self._pat.findall(_clean(text).lower()):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        raw = bytearray(byte_decoder[c] for c in text
                        if c in byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def tokenize(self, texts, context_length: int = 77) -> np.ndarray:
        """[SOT] ids [EOT], zero-padded/truncated — open_clip tokenize()."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > context_length:
                ids = ids[:context_length]
                ids[-1] = self.eot
            out[i, :len(ids)] = ids
        return out
