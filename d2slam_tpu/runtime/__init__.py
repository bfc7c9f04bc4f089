from d2slam_tpu.runtime.pipeline import (
    FrameQueue,
    FramePipeline,
    ImagePrefetcher,
    decode_png,
)
