from .demuxer import FFmpegDemuxer, DemuxResult  # noqa: F401
from .decoder import VideoDecoder, VideoReader, DecodedFrame  # noqa: F401
from .encoder import VideoEncoder, get_encoder_params, ENCODER_OPTIONS  # noqa: F401
from .pool import NativeDecodePool  # noqa: F401
from .muxer import StreamMuxer  # noqa: F401
from .jpeg import (  # noqa: F401
    JpegCoefDecoder,
    JpegCoefEncoder,
    JpegStreamError,
    MjpegReader,
    MjpegTranscoder,
    MjpegWriter,
)
from .transcode import Transcoder, TranscodeStats, transcode, transcode_many  # noqa: F401
