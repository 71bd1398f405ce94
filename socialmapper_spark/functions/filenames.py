"""F12 — filename sanitization for sink paths.

Reference: socialmapper/util/input_validation.py:408-463
``sanitize_filename``. Used by the engine's sinks when callers derive
output paths from data values (POI names etc.); semantics reproduced
exactly: strip path separators, drop ``<>:"|?*`` and control chars,
trim leading/trailing dots+spaces, reject empty results and Windows
reserved device names.
"""

from __future__ import annotations

import re

_DANGEROUS = re.compile(r'[<>:"|?*\x00-\x1f]')

_RESERVED = {
    "CON", "PRN", "AUX", "NUL",
    "COM1", "COM2", "COM3", "COM4", "COM5", "COM6", "COM7", "COM8", "COM9",
    "LPT1", "LPT2", "LPT3", "LPT4", "LPT5", "LPT6", "LPT7", "LPT8", "LPT9",
}


def sanitize_filename(filename: str) -> str:
    """input_validation.py:408-463, exact rules; raises ValueError where
    the reference raises InputValidationError."""
    filename = filename.replace("/", "").replace("\\", "")
    filename = _DANGEROUS.sub("", filename)
    filename = filename.strip(". ")
    if not filename:
        raise ValueError("Filename cannot be empty after sanitization")
    if filename.split(".")[0].upper() in _RESERVED:
        raise ValueError(f"Reserved filename: {filename}")
    return filename
