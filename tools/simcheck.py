#!/usr/bin/env python
"""Measure code similarity between a repo file and its reference twin.

Reports, after stripping docstrings/comments/blank lines:
  * token similarity (difflib ratio over the token stream),
  * the number of identical stripped lines occurring in matching runs of
    >= 4 consecutive lines (the transliteration signal).

Usage: python tools/simcheck.py <repo_file> <reference_file>
"""

import difflib
import io
import sys
import tokenize


def stripped_lines(path):
    """Source lines with comments, docstrings and blanks removed."""
    with open(path, "r") as f:
        source = f.read()
    out = []
    drop = set()
    try:
        tokens = list(tokenize.generate_tokens(io.StringIO(source).readline))
    except tokenize.TokenizeError:
        tokens = []
    prev_significant = None
    for tok in tokens:
        if tok.type == tokenize.COMMENT:
            continue
        if tok.type == tokenize.STRING:
            # a docstring: a string statement at the start of a logical line
            if prev_significant in (None, "NEWLINE", "INDENT", "DEDENT"):
                for ln in range(tok.start[0], tok.end[0] + 1):
                    drop.add(ln)
        if tok.type not in (
            tokenize.NL, tokenize.NEWLINE, tokenize.INDENT,
            tokenize.DEDENT, tokenize.COMMENT,
        ):
            prev_significant = tokenize.tok_name[tok.type]
        elif tok.type in (tokenize.NEWLINE, tokenize.INDENT, tokenize.DEDENT):
            prev_significant = tokenize.tok_name[tok.type]
    for i, raw in enumerate(source.splitlines(), start=1):
        if i in drop:
            continue
        line = raw.split("#", 1)[0].rstrip() if "#" in raw else raw.rstrip()
        # cheap comment strip is wrong inside strings; fall back to raw
        if line.strip():
            out.append(line.strip())
    return out


def tokens_of(path):
    with open(path, "r") as f:
        source = f.read()
    toks = []
    try:
        for tok in tokenize.generate_tokens(io.StringIO(source).readline):
            if tok.type in (
                tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE,
                tokenize.INDENT, tokenize.DEDENT, tokenize.ENCODING,
            ):
                continue
            toks.append(tok.string)
    except tokenize.TokenizeError:
        pass
    return toks


def run_similarity(a_lines, b_lines, min_run=4):
    sm = difflib.SequenceMatcher(a=a_lines, b=b_lines, autojunk=False)
    shared = sum(
        size for _, _, size in sm.get_matching_blocks() if size >= min_run
    )
    return shared


def main():
    repo, ref = sys.argv[1], sys.argv[2]
    a, b = stripped_lines(repo), stripped_lines(ref)
    ta, tb = tokens_of(repo), tokens_of(ref)
    tok_ratio = difflib.SequenceMatcher(
        a=ta, b=tb, autojunk=False
    ).ratio()
    shared = run_similarity(a, b)
    print(f"{repo} vs {ref}")
    print(f"  stripped logic lines: {len(a)} (repo) / {len(b)} (ref)")
    print(f"  identical lines in runs >=4: {shared} "
          f"({shared / max(len(a), 1):.2f} of repo)")
    print(f"  token similarity: {tok_ratio:.2f}")


if __name__ == "__main__":
    main()
