from d2slam_tpu.runtime.pipeline import (
    FrameQueue,
    FramePipeline,
    ImagePrefetcher,
    decode_png,
)
from d2slam_tpu.runtime.system import (
    D2SLAMSystem,
    SystemConfig,
    image_embedding_gdesc,
)
