from .channels import AWGN, BEC, BSC, ERASURE, all_zero_codeword
from . import bitops

__all__ = ["AWGN", "BEC", "BSC", "ERASURE", "all_zero_codeword", "bitops"]
