"""PostgreSQL array-literal text parsing — pure Python, zero Spark imports.

Parses the 1-dimensional PG array text format the reference supports
(`PgArrayUtil.java:9-50` for numeric arrays, `:54-204` for the quoted-string
grammar). Kept Spark-free so it unit-tests against crafted literals and embeds
directly in the Arrow-batched UDF in ``pg_arrays``.

Grammar (matching reference semantics, independently implemented):

- ``{}``                        → empty list
- numeric arrays: brace-stripped, comma-split, strict int/float parse;
  malformed elements raise ``ValueError`` (reference: IllegalArgumentException)
- string arrays: elements either unquoted (run until ``, { } "``) or quoted;
  quoted elements honor escapes ``\\b \\f \\n \\r \\t \\uXXXX \\" \\\\``,
  anything else after a backslash is an error; input must end exactly at the
  closing brace. 1-D only — nested ``{`` inside an unquoted element terminates
  it, exactly like the reference (`PgArrayUtil.java:152-161`).
"""

from __future__ import annotations

from typing import List, Optional


def parse_long_array(text: Optional[str]) -> Optional[List[int]]:
    if text is None:
        return None
    if text == "{}":
        return []
    out = []
    for item in text[1:-1].split(","):
        try:
            out.append(int(item, 10))
        except ValueError as e:
            raise ValueError(f"not a long array: {text}") from e
    return out


def parse_int_array(text: Optional[str]) -> Optional[List[int]]:
    return parse_long_array(text)


def parse_double_array(text: Optional[str]) -> Optional[List[float]]:
    if text is None:
        return None
    if text == "{}":
        return []
    out = []
    for item in text[1:-1].split(","):
        try:
            out.append(float(item))
        except ValueError as e:
            raise ValueError(f"not a double array: {text}") from e
    return out


_ESCAPES = {"b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t", '"': '"', "\\": "\\"}


def parse_string_array(text: Optional[str]) -> Optional[List[str]]:
    if text is None:
        return None
    if text == "{}":
        return []

    n = len(text)
    pos = 0

    def fail(msg: str) -> ValueError:
        return ValueError(
            f"{msg} at offset {pos} (parsed: '{text[:pos]}', remaining: '{text[pos:]}')"
        )

    def eof() -> ValueError:
        return ValueError(f"unexpected end of array literal at offset {pos}")

    if pos >= n or text[pos] != "{":
        raise fail("expect '{'")
    pos += 1

    result: List[str] = []
    while True:
        if pos >= n:
            raise eof()
        if text[pos] == "}":
            break
        # element
        if text[pos] == '"':
            pos += 1
            buf = []
            while True:
                if pos >= n:
                    raise eof()
                c = text[pos]
                pos += 1
                if c == '"':
                    break
                if c == "\\":
                    if pos >= n:
                        raise eof()
                    e = text[pos]
                    pos += 1
                    if e in _ESCAPES:
                        buf.append(_ESCAPES[e])
                    elif e == "u":
                        # bounds + hex-digit check BEFORE consuming: a
                        # truncated or non-hex escape must fail here, not
                        # produce a bogus char and a misleading later error
                        hex4 = text[pos : pos + 4]
                        if len(hex4) < 4 or not all(
                            ch in "0123456789abcdefABCDEF" for ch in hex4
                        ):
                            raise fail("invalid \\u escape: need 4 hex digits")
                        pos += 4
                        buf.append(chr(int(hex4, 16)))
                    else:
                        raise fail(f"unsupported escape sequence: \\{e}")
                else:
                    buf.append(c)
            result.append("".join(buf))
        else:
            start = pos
            while pos < n and text[pos] not in ',{}"':
                pos += 1
            if pos >= n:
                raise eof()
            result.append(text[start:pos])
        # after an element only ',' or '}' may follow (e.g. a nested '{'
        # inside an unquoted element is an error — 1-D only, like the
        # reference's parser which has no recursive case)
        if pos < n and text[pos] == ",":
            pos += 1
        elif pos < n and text[pos] != "}":
            raise fail("element must be followed by ',' or '}'")

    pos += 1  # closing brace
    if pos != n:
        raise fail("trailing characters after closing '}'")
    return result
