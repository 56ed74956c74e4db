import sys
sys.path.insert(0, "/root/repo")
from edgeyolo_tpu.ops.wavelets import get_filter_bank

class Wavelet:
    def __init__(self, name):
        lo, hi, rlo, rhi = get_filter_bank(name)
        self.dec_lo, self.dec_hi = list(lo), list(hi)
        self.rec_lo, self.rec_hi = list(rlo), list(rhi)
