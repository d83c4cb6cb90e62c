#!/usr/bin/env python3
"""Independent reference for byte-level GPT-2-style BPE (driver-side
tooling only, like check_oracle.py — never a code dependency).

Implements the published algorithm (Radford et al. 2019 encoder.py,
public): pre-tokenizer regex, bytes->unicode table, greedy BPE merge
training with the repo's deterministic argmax (count desc, pair
code-point-asc, count >= 2), left-first merge application, and the
lowest-rank encode loop. Used to generate the l114 golden-pin VALUES —
expectations come from THIS independent implementation, not from the
Scala code under test.

Usage: python3 scripts/ref_bytebpe.py [n_merges]
Prints one line per distinct pre-token: units|TAB|sym1|sym2|...
"""
import sys
import regex

CORPUS = [
    "the quick brown fox jumps over the lazy dog by the river",
    "pack my box with five dozen liquor jugs for the long trip",
    "a stitch in time saves nine when the cloth begins to fray",
    "all that glitters is not gold said the old miner at dawn",
    "every good boy deserves fruit after the long practice session",
    "the rain in spain falls mainly on the wide open plain",
    "still waters run deep where the old stone bridge crosses over",
    "many hands make light work when the harvest moon rises early",
]

PAT = regex.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")


def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


B2U = bytes_to_unicode()


def to_units(tok):
    return "".join(B2U[b] for b in tok.encode("utf-8"))


def merge_pass(syms, a, b):
    # left-first, chains included (a fresh merge is immediately
    # eligible as the `a` of the next position)
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def train(vocab, n_merges):
    # vocab: list of (symbol-list, count)
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + c
        best = None
        for k, c in counts.items():
            if c < 2:
                continue
            if best is None or c > best[1] or (c == best[1] and k < best[0]):
                best = (k, c)
        if best is None:
            break
        (a, b), _ = best
        merges.append((a, b))
        vocab = [(merge_pass(s, a, b), c) for s, c in vocab]
    return merges


def encode(units, rank):
    syms = list(units)
    while len(syms) >= 2:
        best, bi = None, None
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, (syms[i], syms[i + 1])
        if best is None:
            break
        syms = merge_pass(syms, bi[0], bi[1])
    return syms


def main():
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    tok_counts = {}
    for line in CORPUS:
        for t in PAT.findall(line):
            tok_counts[t] = tok_counts.get(t, 0) + 1
    vocab = [(list(to_units(t)), c) for t, c in tok_counts.items()]
    merges = train(vocab, n_merges)
    rank = {m: i for i, m in enumerate(merges)}
    rows = []
    for t in tok_counts:
        u = to_units(t)
        rows.append((u, encode(u, rank)))
    for u, syms in sorted(rows):
        print("%s\t%s" % (u, "|".join(syms)))


if __name__ == "__main__":
    main()
