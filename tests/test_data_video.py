"""physicedit_tpu.data.video — the user-facing video IO surface.

Oracles are direct transliterations of the reference algorithms
(DiffSynth-Studio/diffsynth/data/video.py:23-39 natural sort,
video.py:67-80 crop geometry), so ordering and pixel geometry are proven
identical, not just plausible.
"""

import numpy as np
import pytest
from PIL import Image

from physicedit_tpu.data import (
    LowMemoryImageFolder,
    VideoData,
    crop_and_resize,
    merge_video_audio,
    save_frames,
    save_video,
    search_for_images,
)


# --- reference transliterations (oracles) ---------------------------------

def _ref_split_file_name(file_name):
    result, number = [], -1
    for i in file_name:
        if "0" <= i <= "9":
            number = (0 if number == -1 else number) * 10 + ord(i) - ord("0")
        else:
            if number != -1:
                result.append(number)
                number = -1
            result.append(i)
    if number != -1:
        result.append(number)
    return tuple(result)


def _ref_crop_and_resize(image, height, width):
    image = np.array(image)
    image_height, image_width, _ = image.shape
    if image_height / image_width < height / width:
        croped_width = int(image_height / height * width)
        left = (image_width - croped_width) // 2
        image = image[:, left : left + croped_width]
    else:
        croped_height = int(image_width / width * height)
        top = (image_height - croped_height) // 2
        image = image[top : top + croped_height, :]
    return Image.fromarray(image).resize((width, height))


def _frame(i, size=(64, 48)):
    arr = np.zeros((size[1], size[0], 3), np.uint8)
    arr[:, :, 0] = (i * 23) % 256
    arr[4:12, 4:12, 1] = 255
    return Image.fromarray(arr)


# --- natural sort ----------------------------------------------------------

def test_search_for_images_natural_order(tmp_path):
    # Structurally consistent names: the reference's mixed int/str sort key
    # (video.py:44-45) only defines an ordering within one naming scheme.
    names = ["frame10.png", "frame2.png", "frame1.jpg", "frame11b2.png",
             "frame9b30.png"]
    for n in names:
        _frame(0, (8, 8)).save(tmp_path / n)
    (tmp_path / "not_an_image.txt").write_text("x")

    got = [p.rsplit("/", 1)[-1] for p in search_for_images(str(tmp_path))]
    want = sorted(names, key=_ref_split_file_name)
    assert got == want
    assert "not_an_image.txt" not in got


def test_search_for_images_mixed_schemes_do_not_crash(tmp_path):
    # The reference raises TypeError here (int vs str tuple compare when
    # "03.png" meets "zz.png"); our normalized key orders digits first.
    for n in ["03.png", "zz.png", "0004.png", "a1.png"]:
        _frame(0, (8, 8)).save(tmp_path / n)
    got = [p.rsplit("/", 1)[-1] for p in search_for_images(str(tmp_path))]
    assert got == ["03.png", "0004.png", "a1.png", "zz.png"]


# --- crop geometry ---------------------------------------------------------

@pytest.mark.parametrize("src,dst", [
    ((120, 64), (32, 32)),   # too wide -> crop width
    ((50, 90), (32, 32)),    # too tall -> crop height
    ((64, 48), (48, 64)),
    ((33, 47), (16, 24)),    # odd sizes exercise the //2 centering
])
def test_crop_and_resize_matches_reference(src, dst):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (src[1], src[0], 3), np.uint8))
    ours = np.asarray(crop_and_resize(img, dst[1], dst[0]))
    ref = np.asarray(_ref_crop_and_resize(img, dst[1], dst[0]))
    assert ours.shape == ref.shape == (dst[1], dst[0], 3)
    np.testing.assert_array_equal(ours, ref)


# --- VideoData over an image folder ----------------------------------------

def test_videodata_image_folder(tmp_path):
    for i in range(5):
        _frame(i).save(tmp_path / f"{i}.png")
    with VideoData(image_folder=str(tmp_path), height=32, width=24) as v:
        assert v.data_type == "images"
        assert len(v) == 5
        assert v.shape() == (32, 24)
        f0 = v[0]
        assert f0.size == (24, 32)
        v.set_length(3)
        assert len(v) == 3
        assert len(v.raw_data()) == 3

    # no resize when shape is unset: frames come back at native size
    v2 = VideoData(image_folder=str(tmp_path))
    assert v2[1].size == (64, 48)
    assert v2.shape() == (48, 64)

    out = tmp_path / "dump"
    v2.set_length(2)
    v2.save_images(str(out))
    assert sorted(p.name for p in out.iterdir()) == ["0.png", "1.png"]


def test_videodata_requires_a_source():
    with pytest.raises(ValueError):
        VideoData()


def test_low_memory_image_folder_explicit_list(tmp_path):
    for n in ["b.png", "a.png"]:
        _frame(1).save(tmp_path / n)
    folder = LowMemoryImageFolder(str(tmp_path), file_list=["b.png", "a.png"])
    assert len(folder) == 2
    assert folder[0].size == (64, 48)


# --- encoded video roundtrip (gated on the ffmpeg imageio plugin) ----------

def _has_ffmpeg_writer(tmp_path):
    try:
        import imageio

        w = imageio.get_writer(str(tmp_path / "probe.mp4"), fps=8)
        w.append_data(np.zeros((16, 16, 3), np.uint8))
        w.close()
        return True
    except Exception:  # noqa: BLE001 - no ffmpeg plugin in this env
        return False


def test_save_video_roundtrip(tmp_path):
    if not _has_ffmpeg_writer(tmp_path):
        pytest.skip("imageio ffmpeg plugin unavailable")
    frames = [_frame(i) for i in range(6)]
    path = tmp_path / "clip.mp4"
    save_video(frames, str(path), fps=8)
    with VideoData(video_file=str(path), height=24, width=24) as v:
        assert v.data_type == "video"
        assert len(v) == 6
        assert v[2].size == (24, 24)


def test_save_frames(tmp_path):
    save_frames([_frame(i) for i in range(3)], str(tmp_path / "frames"))
    assert sorted(p.name for p in (tmp_path / "frames").iterdir()) == [
        "0.png", "1.png", "2.png"]


def test_merge_video_audio_missing_inputs(tmp_path):
    with pytest.raises(FileNotFoundError):
        merge_video_audio(str(tmp_path / "none.mp4"), str(tmp_path / "none.wav"))
    (tmp_path / "v.mp4").write_bytes(b"x")
    with pytest.raises(FileNotFoundError):
        merge_video_audio(str(tmp_path / "v.mp4"), str(tmp_path / "none.wav"))
