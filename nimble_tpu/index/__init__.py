from nimble_tpu.index.builder import KmerIndex, build_index
from nimble_tpu.index.hashing import mix32_np, bucket_hashes_np

__all__ = ["KmerIndex", "build_index", "mix32_np", "bucket_hashes_np"]
