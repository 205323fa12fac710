from pose3d_tpu.data.chunks import (  # noqa: F401
    list_chunk_files,
    extract_chunk,
    load_chunk_samples,
    open_chunk_store,
    decode_sample,
    decode_chunk_samples,
)
from pose3d_tpu.data.pipeline import StreamingChunkedDataset, BatchLoader  # noqa: F401
from pose3d_tpu.data.collate import collate_fixed  # noqa: F401
