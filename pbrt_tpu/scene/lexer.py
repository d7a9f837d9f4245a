"""Tokenizer for the .pbrt scene-description language.

Reference: src/core/pbrtlex.ll — numbers, quoted strings, ``[``/``]`` array
brackets, ``#`` comments, and an ``Include``-directive file stack
(pbrtlex.ll:62-119). Host-side pure Python; the scene file format is the
compatibility surface, so reference scenes parse unchanged.
"""

from __future__ import annotations

import os
from typing import Iterator, NamedTuple


class Token(NamedTuple):
    kind: str  # 'ident' | 'number' | 'string' | 'lbrack' | 'rbrack'
    value: object
    filename: str
    line: int


def _tokenize_text(text: str, filename: str) -> Iterator[Token]:
    i = 0
    n = len(text)
    line = 1
    while i < n:
        c = text[i]
        if c == "\n":
            line += 1
            i += 1
        elif c in " \t\r":
            i += 1
        elif c == "#":
            while i < n and text[i] != "\n":
                i += 1
        elif c == "[":
            yield Token("lbrack", "[", filename, line)
            i += 1
        elif c == "]":
            yield Token("rbrack", "]", filename, line)
            i += 1
        elif c == '"':
            j = i + 1
            start_line = line
            while j < n and text[j] != '"':
                if text[j] == "\n":
                    line += 1
                j += 1
            if j >= n:
                raise SyntaxError(f"{filename}:{start_line}: unterminated string")
            yield Token("string", text[i + 1 : j], filename, start_line)
            i = j + 1
        else:
            j = i
            while j < n and text[j] not in ' \t\r\n"[]#':
                j += 1
            word = text[i:j]
            tok_line = line
            first = word[0]
            if first.isdigit() or first in "+-." and any(ch.isdigit() for ch in word):
                try:
                    yield Token("number", float(word), filename, tok_line)
                except ValueError:
                    yield Token("ident", word, filename, tok_line)
            else:
                yield Token("ident", word, filename, tok_line)
            i = j
    return


def tokenize(path: str) -> Iterator[Token]:
    """Tokenize a scene file, expanding ``Include`` directives inline
    (reference: pbrtlex.ll include stack + pbrtparse.yy:435-437).
    Include paths resolve relative to the including file's directory
    (reference: core/fileutil.h SetSearchDirectory semantics)."""
    base = os.path.dirname(os.path.abspath(path))
    with open(path, "r", errors="replace") as f:
        text = f.read()
    stream = _tokenize_text(text, path)
    for tok in stream:
        if tok.kind == "ident" and tok.value == "Include":
            inc = next(stream, None)
            if inc is None or inc.kind != "string":
                raise SyntaxError(f"{tok.filename}:{tok.line}: Include needs a filename")
            inc_path = inc.value
            if not os.path.isabs(inc_path):
                inc_path = os.path.join(base, inc_path)
            yield from tokenize(inc_path)
        else:
            yield tok


def tokenize_string(text: str, filename: str = "<string>") -> Iterator[Token]:
    return _tokenize_text(text, filename)
