"""Native libav decoder parity tests (native/video_decoder.cpp)."""

import numpy as np
import pytest

from cut_detection_tpu.data import native_video

pytestmark = pytest.mark.skipif(not native_video.available(),
                                reason="native decoder not built")


def test_info_matches_cv2(synthetic_video):
    from cut_detection_tpu.data.video import open_video

    cap, ref_info = open_video(synthetic_video)
    cap.release()
    src = native_video.NativeVideoSource(synthetic_video)
    assert src.video_info["width"] == ref_info["width"]
    assert src.video_info["height"] == ref_info["height"]
    assert src.video_info["length"] == ref_info["length"]
    assert src.video_info["fps"] == ref_info["fps"]
    src.close()


def test_frames_match_cv2(synthetic_video):
    from cut_detection_tpu.data.video import VideoFrameSource

    ref = VideoFrameSource(synthetic_video)
    ours = native_video.NativeVideoSource(synthetic_video)
    n = 0
    for a, b in zip(ref, ours):
        np.testing.assert_array_equal(b, a, err_msg=f"frame {n}")
        n += 1
        if n >= 40:
            break
    ours.close()


def test_resized_frames_match_cv2(synthetic_video):
    from cut_detection_tpu.data.video import VideoFrameSource

    ref = VideoFrameSource(synthetic_video, resize=256)
    ours = native_video.NativeVideoSource(synthetic_video, resize=256)
    for i, (a, b) in enumerate(zip(ref, ours)):
        np.testing.assert_array_equal(b, a, err_msg=f"frame {i}")
        if i >= 10:
            break
    ours.close()


def test_full_stream_length(synthetic_video):
    src = native_video.NativeVideoSource(synthetic_video)
    frames = list(src)
    assert len(frames) == src.video_info["length"]
    assert src.frames_failed == 0
    src.close()


def test_seek(synthetic_video):
    from cut_detection_tpu.data.video import VideoFrameSource

    ref_frames = list(VideoFrameSource(synthetic_video))
    src = native_video.NativeVideoSource(synthetic_video)
    for target in [0, 37, 150, 7]:
        src.seek(target)
        frame = next(src)
        np.testing.assert_array_equal(frame, ref_frames[target],
                                      err_msg=f"seek {target}")
    src.close()


def test_open_missing_file():
    with pytest.raises(IOError):
        native_video.NativeVideoSource("/no/such/file.mp4")
