"""centrifuger_tpu: a TPU-native metagenomic classification engine.

A from-scratch JAX/XLA implementation of the capabilities of
mourisl/centrifuger (Song & Langmead, Genome Biology 2024): run-block
compressed BWT / FM-index over genome databases, batched backward-search
classification, taxonomy LCA promotion, and abundance EM — redesigned for
TPU hardware (flat bit-packed arrays + vectorized popcount ranks instead of
pointer-walking wavelet trees; fixed-trip scans over read batches instead of
per-read serial loops).
"""

__version__ = "0.1.0"

VERSION_STRING = "1.1.3-r331"  # reference-compatible version string for .4.cfr metadata
