"""Scalar text post-processing (reference §2.8).

Parity targets: ``text_strip`` (``pdf_utils.py:850-868``),
``ocr_post_process`` (``table_common.py:1328-1351``): a lone O/o
becomes 0; numeric strings with multiple dots get all but the last dot
rewritten to thousands commas (``1.234.56`` → ``1,234.56``).
"""

from __future__ import annotations

import re

_OCR_ZERO_RE = re.compile(r"^[Oo]$")
_NUMBERISH_RE = re.compile(r"^[\d.,%\-+]+$")


def text_strip(text: str, strip: str = "") -> str:
    if not strip:
        return text
    return re.sub(
        f"[{''.join(map(re.escape, strip))}]", "", text, flags=re.UNICODE)


def ocr_post_process(text: str) -> str:
    clean = text.replace(" ", "")
    if len(clean) == 1 and _OCR_ZERO_RE.match(clean):
        return "0"
    if clean and _NUMBERISH_RE.match(clean) and any(ch.isdigit() for ch in clean):
        if text.count(".") > 1:
            last = text.rfind(".")
            return text[:last].replace(".", ",") + text[last:]
    return text
