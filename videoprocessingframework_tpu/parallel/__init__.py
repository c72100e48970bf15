from .mesh import make_mesh, batch_sharding, shard_batch, device_round_robin  # noqa: F401
from .streams import MultiStreamPipeline, StreamStats  # noqa: F401
from .multidevice import (  # noqa: F401
    MultiDeviceStreamPipeline,
    ShardedVideoPipeline,
)
from .multihost import (  # noqa: F401
    GlobalBatchAssembler,
    MultiHostVideoPipeline,
)
from . import train  # noqa: F401
