from .packed import PackedSeq
from .bitvector import Bitvector
