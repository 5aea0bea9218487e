"""Lazy, cached build of the native C++ core.

Compiles ``liballophant_native.so`` from the sources in ``native/src`` on first use and
caches it next to a hash stamp of the sources, so repeated imports are free and edits
trigger a rebuild. The library exposes a plain C ABI consumed through ctypes (the
environment provides no pybind11; see ``allophant_tpu.phonemes`` for the binding layer).
"""

import hashlib
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent
_SOURCES = sorted((_NATIVE_DIR / "src").glob("*.cpp"))
_LIBRARY = _NATIVE_DIR / "liballophant_native.so"
_STAMP = _NATIVE_DIR / ".build_stamp"


def _source_digest() -> str:
    digest = hashlib.sha256()
    for source in _SOURCES:
        digest.update(source.read_bytes())
    return digest.hexdigest()


def library_path() -> Path:
    """Returns the path to the built shared library, compiling if needed.

    Raises ``RuntimeError`` if compilation fails (callers fall back to the pure-Python
    implementation in that case).
    """
    digest = _source_digest()
    if _LIBRARY.exists() and _STAMP.exists() and _STAMP.read_text().strip() == digest:
        return _LIBRARY

    compiler = os.environ.get("CXX", "g++")
    command = [
        compiler,
        "-O3",
        "-std=c++17",
        "-fPIC",
        "-shared",
        "-o",
        str(_LIBRARY),
        *(str(source) for source in _SOURCES),
    ]
    result = subprocess.run(command, capture_output=True, text=True)
    if result.returncode != 0:
        raise RuntimeError(f"native build failed:\n{result.stderr}")
    _STAMP.write_text(digest)
    return _LIBRARY
