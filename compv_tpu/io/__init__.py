"""Host-side IO: images, video, camera abstraction, serialization
(reference: base image decoder, core/video, camera/ — SURVEY.md §2.2, §2.5)."""
from compv_tpu.io.image_io import (  # noqa: F401
    read_image, write_image, read_raw, write_raw, parse_raw_filename,
)
from compv_tpu.io.video import (  # noqa: F401
    VideoReader, open_video, RawYuvReader, ImageSequenceReader, GifReader,
    FfmpegReader, VideoWriterRaw,
)
from compv_tpu.io.camera import (  # noqa: F401
    Camera, VideoFileCamera, SyntheticCamera, list_devices,
)
from compv_tpu.io.exif import (  # noqa: F401
    ExifData, read_exif, orientation_to_transform,
)
from compv_tpu.io.serialize import (  # noqa: F401
    array_to_json, array_from_json, save_mat_json, load_mat_json,
    save_checkpoint, load_checkpoint, save_npz, load_npz,
)
