"""Byte-level BPE tokenizer (pure Python, deterministic) for REAL
token counts.

The engine's q41 ``n_bpe_tokens`` is a regex class-split proxy; packing
(q98) counts whitespace tokens. A real pretraining pipeline budgets
sequences in actual BPE tokens, so this module implements the published
byte-level BPE algorithm (Sennrich et al. 2016, arXiv:1508.07909, as
used byte-level in the GPT-2 paper, Radford et al. 2019):

* pre-tokenize with an ASCII approximation of GPT-2's split pattern
  (contractions / letter runs / digit runs / punct runs / whitespace —
  Python ``re`` has no ``\\p{L}``, and the corpus is ASCII-clean);
* start from raw bytes, merge the most frequent adjacent pair per
  round (ties broken lexicographically so training is deterministic);
* encode by repeatedly applying the lowest-rank merge — the standard
  greedy BPE encode.

The merge table is TRAINED AT IMPORT from a fixed in-file seed corpus
(deterministic: same code → same vocab, no network, no model files —
the real GPT-2 vocab is a downloadable artifact this container doesn't
have). 256 merges is enough to give natural English text a realistic
~0.3 tokens/char rate; swap ``MERGES`` for a production vocab's merge
list and everything downstream is unchanged.

Spark-side: ``bpe_token_count_udf`` is an Arrow-batched pandas UDF
(the stemmer's pattern — ``functions/text.py``) with an LRU cache per
unique pre-token; Python is the honest cost here, as tokenization is
not expressible in built-in SQL functions.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd

# ASCII approximation of the GPT-2 pre-tokenizer regex (the published
# pattern uses \p{L}/\p{N}; ours narrows to ASCII classes)
_PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

# Fixed seed corpus for the import-time vocabulary: generic English
# with code/number/punct flavor so merges cover the byte classes the
# documents table actually contains.
_SEED_CORPUS = """
the quick brown fox jumps over the lazy dog and then the dog chases
the fox into the forest where they both rest under a tree by the
river the water flows down the valley and into the sea where ships
carry goods from port to port trading goods and stories with every
nation they visit the people of the towns gather in markets to buy
bread and salt and cloth and talk about the news of the day which
travels slowly from town to town by riders on horses or by letters
carried in leather bags sealed with wax stamps that show the sender
is trusted and the message is true and complete in all of its parts
it was the best of times it was the worst of times it was the age of
wisdom it was the age of foolishness we had everything before us we
had nothing before us the sun rose over the hills and the workers
went out into the fields to plant and to harvest and to tend the
animals that give milk and wool and meat for the winter months when
the snow covers the ground and the rivers freeze over and the days
grow short and the nights grow long and cold and quiet and the fire
in the hearth is the center of the home where stories are told 123
456 7890 2024 100 3.14 www.example.com user@example.com hello world
print return if else for while true false none import def class the
value of the function is computed from the input and returned to the
caller which stores the result in a variable for later use in the
program that runs on the machine that sits in the room full of other
machines doing the same kind of work all day and all night without
rest because they are machines and machines do not need to rest
"""

N_MERGES = 256


def _pretokens(text: str) -> list[str]:
    return _PRETOKEN_RE.findall(text)


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[bytes, bytes]]:
    """Learn ``n_merges`` byte-pair merges from ``texts``.

    Classic frequency-driven training over pre-token counts; ties on
    frequency break by pair bytes (lexicographic) so the result is a
    pure function of the inputs.
    """
    # word -> frequency, each word a tuple of byte-units
    words: dict[tuple[bytes, ...], int] = {}
    for t in texts:
        for tok in _pretokens(t):
            key = tuple(bytes([b]) for b in tok.encode("utf-8"))
            if key:
                words[key] = words.get(key, 0) + 1

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[bytes, bytes], int] = {}
        for w, c in words.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[bytes, ...], int] = {}
        for w, c in words.items():
            out: list[bytes] = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == best[0] and w[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            k = tuple(out)
            new_words[k] = new_words.get(k, 0) + c
        words = new_words
    return merges


MERGES: list[tuple[bytes, bytes]] = train_bpe([_SEED_CORPUS], N_MERGES)
_RANKS: dict[tuple[bytes, bytes], int] = {p: i for i, p in enumerate(MERGES)}


def _encode_parts(parts: list[bytes], ranks: dict[tuple[bytes, bytes], int]) -> list[bytes]:
    """Greedy BPE encode: repeatedly apply the LOWEST-rank applicable
    merge (training order = priority order — the standard algorithm)."""
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


@lru_cache(maxsize=65536)
def _pretoken_n_units(tok: str) -> int:
    parts = [bytes([b]) for b in tok.encode("utf-8")]
    return len(_encode_parts(parts, _RANKS))


def encode(text: str) -> list[bytes]:
    """Tokenize ``text``; returns the byte-chunk per token (token ids
    would be an arbitrary enumeration of chunks — counts and chunks
    are what the pipeline consumes)."""
    out: list[bytes] = []
    for tok in _pretokens(text):
        parts = [bytes([b]) for b in tok.encode("utf-8")]
        out.extend(_encode_parts(parts, _RANKS))
    return out


def count_tokens(text: str | None) -> int:
    """Number of BPE tokens in ``text`` (0 for NULL/empty)."""
    if not text:
        return 0
    return sum(_pretoken_n_units(tok) for tok in _pretokens(text))


def bpe_token_count_series(s: pd.Series) -> pd.Series:
    return s.map(count_tokens).astype("int64")


def make_ranks(merges: list[tuple[bytes, bytes]]) -> dict[tuple[bytes, bytes], int]:
    """Merge list → rank table (training order = merge priority)."""
    return {p: i for i, p in enumerate(merges)}


def bpe_token_count_series_for(merges: list[tuple[bytes, bytes]]):
    """Token-count series mapper bound to an INJECTED merge table —
    how q102/q103-style counting consumes a corpus-trained vocabulary
    (``operators/bpe_train.train_bpe_distributed``) instead of the
    import-time seed vocab. Same LRU-per-pre-token shape as the
    module-level counter."""
    ranks = make_ranks(merges)

    @lru_cache(maxsize=65536)
    def n_units(tok: str) -> int:
        parts = [bytes([b]) for b in tok.encode("utf-8")]
        return len(_encode_parts(parts, ranks))

    def count(text: str | None) -> int:
        if not text:
            return 0
        return sum(n_units(tok) for tok in _pretokens(text))

    def mapper(s: pd.Series) -> pd.Series:
        return s.map(count).astype("int64")

    return mapper
