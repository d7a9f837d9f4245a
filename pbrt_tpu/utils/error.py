"""Error-reporting subsystem: Info / Warning / Error / Severe.

Reference: src/core/error.cpp:33-135 — severity-labelled messages on
stderr, word-wrapped to the terminal width with a 4-space continuation
indent, an optional "file(line): " parse-position prefix, and
quiet/verbose gating (Info prints only with --verbose; Warning is
suppressed by --quiet; Error always prints; Severe aborts).

Additions over the reference (documented divergences):
  - repeat dedup: the same message body is printed at most
    ``MAX_REPEATS`` times, then one suppression notice is emitted —
    wavefront renders can hit a per-lane warning millions of times.
  - Severe raises ``SystemExit(1)`` instead of ``abort()``.
"""

from __future__ import annotations

import os
import shutil
import sys
import threading

MAX_REPEATS = 5

# global options (mirrors pbrt's PbrtOptions; set by the CLI)
_opts = {"quiet": False, "verbose": False}
# parse position (mirrors current_file/line_num set by the lexer)
_pos = {"file": "", "line": 0}
_counts: dict[str, int] = {}
_lock = threading.Lock()


def set_options(quiet: bool = False, verbose: bool = False) -> None:
    _opts["quiet"] = bool(quiet)
    _opts["verbose"] = bool(verbose)


def set_parse_position(filename: str = "", line: int = 0) -> None:
    """Called by the scene parser so messages carry "file(line): "."""
    _pos["file"] = filename
    _pos["line"] = int(line)


def reset() -> None:
    """Clear dedup state (tests)."""
    with _lock:
        _counts.clear()
    set_parse_position()


def _terminal_width() -> int:
    try:
        return shutil.get_terminal_size().columns
    except (ValueError, OSError):
        return 80


def _process(message: str, label: str, out=None) -> None:
    """Word-wrapped severity print (processError, error.cpp:43-100)."""
    out = out or sys.stderr
    with _lock:
        n = _counts.get(message, 0) + 1
        _counts[message] = n
    if n > MAX_REPEATS:
        return
    width = max(20, _terminal_width() - 2)
    prefix = ""
    if _pos["line"] != 0:
        prefix = f"{_pos['file']}({_pos['line']}): "
    column = len(prefix) + len(label) + 2
    pieces = [prefix, label, ": "]
    for word in message.split():
        if column + len(word) > width:
            pieces.append("\n    ")
            column = 4
        pieces.append(word + " ")
        column += len(word) + 1
    if n == MAX_REPEATS:
        pieces.append("\n    (message repeated; further occurrences "
                      "suppressed)")
    print("".join(pieces).rstrip(" "), file=out)


def info(message: str) -> None:
    """Notice — only with --verbose and not --quiet (error.cpp:104-110)."""
    if not _opts["verbose"] or _opts["quiet"]:
        return
    _process(message, "Notice")


def warning(message: str) -> None:
    """Suppressed by --quiet (error.cpp:113-120)."""
    if _opts["quiet"]:
        return
    _process(message, "Warning")


def error(message: str) -> None:
    """Always printed; execution continues (error.cpp:122-127)."""
    _process(message, "Error")


def severe(message: str) -> None:
    """Fatal: print and exit (error.cpp:130-135 — abort() → exit(1))."""
    _process(message, "Fatal Error")
    raise SystemExit(1)
