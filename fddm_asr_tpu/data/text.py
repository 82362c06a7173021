# -*- coding: utf-8 -*-
"""Text normalization for manifest building.

Behavioral reference: preprocess.py:97-112 `normalize_text`, operation order
preserved exactly (parens -> lowercase -> whitespace collapse/strip -> strip
non-[word/space/CJK U+4E00..U+9FFF] chars; note the reference does NOT
re-collapse whitespace after the final character filter, and only strips
ASCII parentheses).
"""
from __future__ import annotations

import re

_PARENS = re.compile(r"\([^)]*\)")
_KEEP = re.compile(r"[^\w\s一-鿿]")
_WS = re.compile(r"\s+")


def normalize_text(text: str) -> str:
    if not isinstance(text, str):
        return ""
    text = _PARENS.sub("", text)
    text = text.lower()
    text = _WS.sub(" ", text).strip()
    return _KEEP.sub("", text)
