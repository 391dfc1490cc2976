"""Faithful reimplementation of the public wordninja package's split()
(github.com/keredson/wordninja — pure-Python, MIT; the package itself
is not installable in this offline container). Same DP, same Zipf cost
model `log((rank)·log(V))`, same `[^a-zA-Z0-9']+` pre-split, same
apostrophe/digit re-attach rules, same min() tie-break (smallest last
token on equal cost).

The wordlist is the EXPORTED corpus-derived vocabulary
(wordninja_words.txt in the stage cwd, frequency-ranked exactly like
graft's Text.segmentDict) instead of the package's bundled 125k-word
English list — maxword 6 vs 24, so every DP position checks strictly
FEWER candidates than the real package would: the conservative
direction for a reference baseline.
"""
import math
import os
import re

_words = open(os.environ.get('WORDNINJA_WORDLIST', 'wordninja_words.txt'),
              encoding='utf-8').read().split()
_wordcost = {k: math.log((i + 1) * math.log(len(_words)))
             for i, k in enumerate(_words)}
_maxword = max(len(x) for x in _words)
_SPLIT_RE = re.compile("[^a-zA-Z0-9']+")


def split(s):
    l = [_split(x) for x in _SPLIT_RE.split(s)]
    return [item for sublist in l for item in sublist]


def _split(s):
    def best_match(i):
        candidates = enumerate(reversed(cost[max(0, i - _maxword):i]))
        return min((c + _wordcost.get(s[i - k - 1:i].lower(), 9e999), k + 1)
                   for k, c in candidates)

    cost = [0]
    for i in range(1, len(s) + 1):
        c, k = best_match(i)
        cost.append(c)

    out = []
    i = len(s)
    while i > 0:
        c, k = best_match(i)
        assert c == cost[i]
        new_token = True
        if not s[i - k:i] == "'":
            if len(out) > 0:
                if out[-1] == "'s" or \
                        (s[i - 1].isdigit() and out[-1][0].isdigit()):
                    out[-1] = s[i - k:i] + out[-1]
                    new_token = False
        if new_token:
            out.append(s[i - k:i])
        i -= k
    return list(reversed(out))
