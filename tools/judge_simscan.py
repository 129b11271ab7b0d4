#!/usr/bin/env python3
"""Judge's token-level similarity scan: repo .py files vs same-named reference files.

Strips comments/docstrings, tokenizes, difflib ratio on token streams.
"""
import difflib
import io
import os
import sys
import tokenize

REPO = "/root/repo/dm_control_tpu"
REF = "/root/reference/dm_control"


def code_tokens(path):
    try:
        with open(path, "rb") as f:
            src = f.read()
    except OSError:
        return None
    toks = []
    try:
        for tok in tokenize.tokenize(io.BytesIO(src).readline):
            if tok.type in (tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE,
                            tokenize.INDENT, tokenize.DEDENT, tokenize.ENCODING):
                continue
            if tok.type == tokenize.STRING and tok.string.startswith(('"""', "'''", 'r"""', "b'''")):
                continue
            s = tok.string
            if s in ("dm_control_tpu", "dm_control"):
                s = "PKG"
            toks.append(s)
    except tokenize.TokenError:
        pass
    return toks


def ref_index():
    idx = {}
    for root, _, files in os.walk(REF):
        for fn in files:
            if fn.endswith(".py") and not fn.endswith("_test.py"):
                idx.setdefault(fn, []).append(os.path.join(root, fn))
    return idx


def main():
    idx = ref_index()
    rows = []
    for root, _, files in os.walk(REPO):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            rp = os.path.join(root, fn)
            rtoks = code_tokens(rp)
            if not rtoks or len(rtoks) < 100:
                continue
            best = (0.0, None)
            for cand in idx.get(fn, []):
                ctoks = code_tokens(cand)
                if not ctoks:
                    continue
                r = difflib.SequenceMatcher(None, rtoks, ctoks, autojunk=False).ratio()
                if r > best[0]:
                    best = (r, cand)
            rel = os.path.relpath(rp, REPO)
            rows.append((best[0], rel, best[1], len(rtoks)))
    rows.sort(reverse=True)
    for r, rel, cand, n in rows:
        if r >= 0.35:
            print(f"{r:.2f}  {rel}  ({n} toks)  vs {cand}")
    print("---")
    print(f"total files scanned: {len(rows)}")


if __name__ == "__main__":
    main()
