"""Native (C++) components, loaded via ctypes with on-demand compilation.

The compute path is JAX/XLA; this package holds the host runtime's native
pieces, each with a pure-Python fallback:
  sais.cpp        linear-time SA-IS suffix sort (offline index build)
  sa_chunked.cpp  difference-cover chunked SA builder (--build-mem path)
  fastqpack.cpp   one-pass FASTQ parse + 2-bit pack (serving producer)
  tsvquant.cpp    one-pass classification-TSV ingest (quantifier)
"""

import ctypes
import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build_lib(name):
    src = os.path.join(_HERE, name + ".cpp")
    out = os.path.join(_HERE, "lib" + name + ".so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", "-o", out, src]
    sys.stderr.write("[native] compiling %s\n" % name)
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load(name):
    """Load (compiling if needed) the named native library; returns CDLL or
    None if the toolchain is unavailable."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        try:
            lib = ctypes.CDLL(_build_lib(name))
        except Exception as e:  # no compiler / load failure -> pure-python fallback
            sys.stderr.write("[native] %s unavailable (%s); using fallback\n"
                             % (name, e))
            lib = None
        _LIBS[name] = lib
        return lib
