"""Fake-data tests for the long-tail datasets (the reference's
``test/test_datasets.py`` inject-fake-data strategy, ``datasets_utils.py:178``)."""

import bz2
import json
import os

import numpy as np
import pytest

from cpu_vision_tpu import datasets
from cpu_vision_tpu.io import write_jpeg, write_png
from cpu_vision_tpu.io._png16 import read_png_16, write_png_16


def _img(rng, h=16, w=16, c=3):
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


class TestPng16:
    def test_roundtrip_16bit_rgb(self, tmp_path, rng):
        arr = rng.integers(0, 65536, (7, 5, 3), dtype=np.uint16)
        p = str(tmp_path / "x.png")
        write_png_16(p, arr)
        out = read_png_16(p)
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, arr)

    def test_roundtrip_16bit_gray(self, tmp_path, rng):
        arr = rng.integers(0, 65536, (6, 9), dtype=np.uint16)
        p = str(tmp_path / "g.png")
        write_png_16(p, arr)
        np.testing.assert_array_equal(read_png_16(p), arr)

    def test_reads_native_8bit(self, tmp_path, rng):
        arr = _img(rng)
        p = str(tmp_path / "8.png")
        write_png(arr, p)
        out = read_png_16(p)
        np.testing.assert_array_equal(out, arr)


class TestUSPS:
    def test_parse(self, tmp_path, rng):
        lines = []
        for label in (1, 10, 3):
            vals = rng.uniform(-1, 1, 256)
            lines.append(
                f"{label} " + " ".join(f"{i+1}:{v:.6f}" for i, v in enumerate(vals)))
        with bz2.open(tmp_path / "usps.bz2", "wt") as f:
            f.write("\n".join(lines))
        ds = datasets.USPS(str(tmp_path), train=True)
        assert len(ds) == 3
        img, target = ds[0]
        assert img.shape == (16, 16, 1) and img.dtype == np.uint8
        assert target == 0
        assert ds[1][1] == 9


class TestSEMEION:
    def test_parse(self, tmp_path, rng):
        rows = []
        for label in (2, 7):
            pix = rng.integers(0, 2, 256)
            onehot = np.zeros(10, int)
            onehot[label] = 1
            rows.append(" ".join(map(str, np.concatenate([pix, onehot]))))
        (tmp_path / "semeion.data").write_text("\n".join(rows))
        ds = datasets.SEMEION(str(tmp_path))
        assert len(ds) == 2
        img, target = ds[0]
        assert img.shape == (16, 16, 1)
        assert (target, ds[1][1]) == (2, 7)


def _write_idx(path, arr):
    import struct

    ty = {np.uint8: 8, np.int32: 12}[arr.dtype.type]
    with open(path, "wb") as f:
        f.write(struct.pack(">i", ty * 256 + arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">i", d))
        f.write(arr.astype({8: np.uint8, 12: ">i4"}[ty]).tobytes())


class TestEMNIST:
    def test_parse(self, tmp_path, rng):
        raw = tmp_path / "EMNIST" / "raw"
        raw.mkdir(parents=True)
        imgs = rng.integers(0, 256, (4, 28, 28), dtype=np.uint8)
        labels = np.array([0, 1, 2, 3], np.uint8)
        _write_idx(raw / "emnist-digits-train-images-idx3-ubyte", imgs)
        _write_idx(raw / "emnist-digits-train-labels-idx1-ubyte", labels)
        ds = datasets.EMNIST(str(tmp_path), split="digits", train=True)
        assert len(ds) == 4
        img, target = ds[2]
        assert img.shape == (28, 28, 1) and target == 2
        assert ds.classes == [str(i) for i in range(10)]


class TestQMNIST:
    def _write(self, tmp_path, rng, what="train", n=5):
        raw = tmp_path / "QMNIST" / "raw"
        raw.mkdir(parents=True, exist_ok=True)
        prefix = "xnist" if what == "nist" else f"qmnist-{datasets.QMNIST.subsets[what]}"
        imgs = rng.integers(0, 256, (n, 28, 28), dtype=np.uint8)
        labels = np.zeros((n, 8), np.int32)
        labels[:, 0] = np.arange(n) % 10
        _write_idx(raw / f"{prefix}-images-idx3-ubyte", imgs)
        _write_idx(raw / f"{prefix}-labels-idx2-int", labels)

    def test_compat(self, tmp_path, rng):
        self._write(tmp_path, rng)
        ds = datasets.QMNIST(str(tmp_path), train=True)
        img, target = ds[3]
        assert img.shape == (28, 28, 1) and target == 3

    def test_full_labels(self, tmp_path, rng):
        self._write(tmp_path, rng)
        ds = datasets.QMNIST(str(tmp_path), compat=False, train=True)
        _, target = ds[1]
        assert target.shape == (8,) and target[0] == 1

    def test_test10k(self, tmp_path, rng):
        self._write(tmp_path, rng, what="test", n=12)
        # test10k slices the first 10k of the test set; with 12 rows -> 10k cap
        ds = datasets.QMNIST(str(tmp_path), what="test10k")
        assert len(ds) == 12  # < 10000, all kept


class TestStanfordCars:
    def test_parse(self, tmp_path, rng):
        from scipy.io import savemat

        base = tmp_path / "stanford_cars"
        (base / "devkit").mkdir(parents=True)
        (base / "cars_train").mkdir()
        write_jpeg(_img(rng), str(base / "cars_train" / "00001.jpg"))
        savemat(base / "devkit" / "cars_train_annos.mat",
                {"annotations": np.array([("00001.jpg", 3)],
                 dtype=[("fname", "O"), ("class", "i4")])})
        savemat(base / "devkit" / "cars_meta.mat",
                {"class_names": np.array(["a", "b", "c"], object)})
        ds = datasets.StanfordCars(str(tmp_path), split="train")
        assert len(ds) == 1
        img, target = ds[0]
        assert img.shape == (16, 16, 3) and target == 2


class TestSUN397:
    def test_parse(self, tmp_path, rng):
        base = tmp_path / "SUN397"
        (base / "a" / "abbey").mkdir(parents=True)
        (base / "b" / "bar").mkdir(parents=True)
        (base / "ClassName.txt").write_text("/a/abbey\n/b/bar\n")
        write_jpeg(_img(rng), str(base / "a" / "abbey" / "sun_0001.jpg"))
        write_jpeg(_img(rng), str(base / "b" / "bar" / "sun_0002.jpg"))
        ds = datasets.SUN397(str(tmp_path))
        assert len(ds) == 2
        targets = sorted(ds[i][1] for i in range(2))
        assert targets == [0, 1]


class TestCLEVR:
    def test_parse(self, tmp_path, rng):
        base = tmp_path / "clevr" / "CLEVR_v1.0"
        (base / "images" / "train").mkdir(parents=True)
        (base / "scenes").mkdir()
        names = ["CLEVR_train_000000.png", "CLEVR_train_000001.png"]
        for n in names:
            write_png(_img(rng), str(base / "images" / "train" / n))
        scenes = {"scenes": [
            {"image_filename": names[0], "objects": [{}] * 3},
            {"image_filename": names[1], "objects": [{}] * 5},
        ]}
        (base / "scenes" / "CLEVR_train_scenes.json").write_text(json.dumps(scenes))
        ds = datasets.CLEVRClassification(str(tmp_path), split="train")
        assert len(ds) == 2
        assert ds[0][1] == 3 and ds[1][1] == 5


class TestFGVCAircraft:
    def test_parse(self, tmp_path, rng):
        data = tmp_path / "fgvc-aircraft-2013b" / "data"
        (data / "images").mkdir(parents=True)
        (data / "variants.txt").write_text("707-320\nA300B4\n")
        write_jpeg(_img(rng), str(data / "images" / "0001.jpg"))
        (data / "images_variant_trainval.txt").write_text("0001 A300B4\n")
        ds = datasets.FGVCAircraft(str(tmp_path))
        assert len(ds) == 1 and ds[0][1] == 1


class TestRenderedSST2:
    def test_parse(self, tmp_path, rng):
        for cls in ("negative", "positive"):
            d = tmp_path / "rendered-sst2" / "train" / cls
            d.mkdir(parents=True)
            write_png(_img(rng), str(d / "a.png"))
        ds = datasets.RenderedSST2(str(tmp_path), split="train")
        assert len(ds) == 2
        assert sorted(t for _, t in ds._samples) == [0, 1]


class TestPCAM:
    def test_parse(self, tmp_path, rng):
        h5py = pytest.importorskip("h5py")
        base = tmp_path / "pcam"
        base.mkdir()
        with h5py.File(base / "camelyonpatch_level_2_split_train_x.h5", "w") as f:
            f["x"] = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
        with h5py.File(base / "camelyonpatch_level_2_split_train_y.h5", "w") as f:
            f["y"] = np.array([1, 0]).reshape(2, 1, 1, 1)
        ds = datasets.PCAM(str(tmp_path), split="train")
        assert len(ds) == 2
        img, target = ds[0]
        assert img.shape == (8, 8, 3) and target == 1


class TestPlaces365:
    def test_parse(self, tmp_path, rng):
        (tmp_path / "categories_places365.txt").write_text(
            "/a/abbey 0\n/b/bar 1\n")
        (tmp_path / "places365_val.txt").write_text("img0.jpg 1\n")
        d = tmp_path / "val_large"
        d.mkdir()
        write_jpeg(_img(rng), str(d / "img0.jpg"))
        ds = datasets.Places365(str(tmp_path), split="val")
        assert len(ds) == 1
        img, target = ds[0]
        assert target == 1 and img.shape == (16, 16, 3)


class TestINaturalist:
    def test_parse(self, tmp_path, rng):
        v = tmp_path / "2021_train"
        d0 = v / "00000_Animalia_Chordata_Aves_Passeriformes_Corvidae_Corvus_corax"
        d1 = v / "00001_Plantae_Tracheophyta_Liliopsida_Poales_Poaceae_Poa_annua"
        d0.mkdir(parents=True)
        d1.mkdir()
        write_jpeg(_img(rng), str(d0 / "a.jpg"))
        write_jpeg(_img(rng), str(d1 / "b.jpg"))
        ds = datasets.INaturalist(str(tmp_path), version="2021_train",
                                  target_type=["full", "kingdom", "genus"])
        assert len(ds) == 2
        _, target = ds[1]
        assert target == (1, 1, 1)
        assert ds.category_name("kingdom", 0) == "Animalia"


class TestImagenette:
    def test_parse(self, tmp_path, rng):
        d = tmp_path / "imagenette2" / "train" / "n01440764"
        d.mkdir(parents=True)
        write_jpeg(_img(rng), str(d / "x.JPEG"))
        ds = datasets.Imagenette(str(tmp_path), split="train")
        assert len(ds) == 1
        assert ds.classes[0] == ("tench", "Tinca tinca")
        img, target = ds[0]
        assert target == 0


class TestLFWPairs:
    def test_parse(self, tmp_path, rng):
        base = tmp_path / "lfw-py"
        for name, n in (("Aaron_Peirsol", 2), ("Zach_Braff", 1)):
            d = base / "lfw" / name
            d.mkdir(parents=True)
            for i in range(1, n + 1):
                write_jpeg(_img(rng), str(d / f"{name}_{i:04d}.jpg"))
        (base / "pairsDevTrain.txt").write_text(
            "1\nAaron_Peirsol\t1\t2\nAaron_Peirsol\t1\tZach_Braff\t1\n")
        ds = datasets.LFWPairs(str(tmp_path), split="train", image_set="original")
        assert len(ds) == 2
        img1, img2, same = ds[0]
        assert same == 1 and img1.shape == (16, 16, 3)
        assert ds[1][2] == 0


class TestWIDERFace:
    def test_parse(self, tmp_path, rng):
        base = tmp_path / "widerface"
        split = base / "wider_face_split"
        imgs = base / "WIDER_train" / "images" / "0--Parade"
        split.mkdir(parents=True)
        imgs.mkdir(parents=True)
        write_jpeg(_img(rng), str(imgs / "x.jpg"))
        write_jpeg(_img(rng), str(imgs / "y.jpg"))
        (split / "wider_face_train_bbx_gt.txt").write_text(
            "0--Parade/x.jpg\n2\n"
            "10 10 20 20 0 0 0 0 0 0\n30 30 15 15 1 0 0 0 0 0\n"
            "0--Parade/y.jpg\n0\n0 0 0 0 0 0 0 0 0 0\n")
        ds = datasets.WIDERFace(str(tmp_path), split="train")
        assert len(ds) == 2
        img, target = ds[0]
        assert target["bbox"].shape == (2, 4)
        assert target["blur"].tolist() == [0, 1]
        assert ds[1][1]["bbox"].shape == (0, 4)


class TestSBDataset:
    def test_segmentation(self, tmp_path, rng):
        from scipy.io import savemat

        (tmp_path / "img").mkdir()
        (tmp_path / "cls").mkdir()
        write_jpeg(_img(rng), str(tmp_path / "img" / "s0.jpg"))
        seg = rng.integers(0, 21, (16, 16), dtype=np.uint8)
        savemat(tmp_path / "cls" / "s0.mat",
                {"GTcls": {"Segmentation": seg, "Boundaries": np.zeros(1)}})
        (tmp_path / "train.txt").write_text("s0\n")
        ds = datasets.SBDataset(str(tmp_path), image_set="train", mode="segmentation")
        img, target = ds[0]
        assert img.shape == (16, 16, 3)
        np.testing.assert_array_equal(np.asarray(target).squeeze(), seg)


class TestCityscapes:
    def test_parse(self, tmp_path, rng):
        city = "frankfurt"
        imgd = tmp_path / "leftImg8bit" / "val" / city
        gtd = tmp_path / "gtFine" / "val" / city
        imgd.mkdir(parents=True)
        gtd.mkdir(parents=True)
        stem = "frankfurt_000000_000294"
        write_png(_img(rng), str(imgd / f"{stem}_leftImg8bit.png"))
        sem = rng.integers(0, 34, (16, 16, 1), dtype=np.uint8)
        write_png(sem, str(gtd / f"{stem}_gtFine_labelIds.png"))
        (gtd / f"{stem}_gtFine_polygons.json").write_text(json.dumps(
            {"imgHeight": 16, "imgWidth": 16, "objects": []}))
        ds = datasets.Cityscapes(str(tmp_path), split="val", mode="fine",
                                 target_type=["semantic", "polygon"])
        img, (semantic, polygon) = ds[0]
        assert img.shape == (16, 16, 3)
        np.testing.assert_array_equal(np.asarray(semantic).squeeze(), sem.squeeze())
        assert polygon["imgHeight"] == 16
        assert datasets.Cityscapes.classes[7].name == "road"


class TestKitti:
    def test_parse(self, tmp_path, rng):
        raw = tmp_path / "Kitti" / "raw" / "training"
        (raw / "image_2").mkdir(parents=True)
        (raw / "label_2").mkdir()
        write_png(_img(rng), str(raw / "image_2" / "000000.png"))
        (raw / "label_2" / "000000.txt").write_text(
            "Car 0.0 0 1.5 10 20 50 60 1.5 1.6 3.9 1 2 3 0.5\n")
        ds = datasets.Kitti(str(tmp_path), train=True)
        img, target = ds[0]
        assert target[0]["type"] == "Car"
        assert target[0]["bbox"] == [10.0, 20.0, 50.0, 60.0]


class TestPhotoTour:
    def test_parse(self, tmp_path, rng):
        from PIL import Image

        d = tmp_path / "liberty"
        d.mkdir()
        # one sheet of 4 patches (128x128 = 2x2 grid of 64x64)
        sheet = rng.integers(0, 256, (128, 128), dtype=np.uint8)
        Image.fromarray(sheet, mode="L").save(d / "patches0000.bmp")
        (d / "info.txt").write_text("0 0\n0 0\n1 0\n1 0\n")
        (d / "m50_100000_100000_0.txt").write_text(
            "0 0 0 1 0 0\n2 1 0 3 1 0\n0 0 0 2 1 0\n")
        ds = datasets.PhotoTour(str(tmp_path), "liberty", train=True)
        assert len(ds) == 4
        assert ds[0].shape == (64, 64)
        ds_test = datasets.PhotoTour(str(tmp_path), "liberty", train=False)
        d1, d2, m = ds_test[0]
        assert m == 1 and d1.shape == (64, 64)
        assert ds_test[2][2] == 0


class TestSBU:
    def test_parse(self, tmp_path, rng):
        d = tmp_path / "dataset"
        d.mkdir()
        (d / "SBU_captioned_photo_dataset_urls.txt").write_text(
            "http://x.com/a.jpg\nhttp://x.com/missing.jpg\n")
        (d / "SBU_captioned_photo_dataset_captions.txt").write_text(
            "a caption\nanother\n")
        write_jpeg(_img(rng), str(d / "a.jpg"))
        ds = datasets.SBU(str(tmp_path))
        assert len(ds) == 1  # missing photo skipped
        img, caption = ds[0]
        assert caption == "a caption"


class TestFlickr:
    def test_flickr30k(self, tmp_path, rng):
        write_jpeg(_img(rng), str(tmp_path / "img0.jpg"))
        ann = tmp_path / "ann.txt"
        ann.write_text("img0.jpg#0\tfirst caption\nimg0.jpg#1\tsecond\n")
        ds = datasets.Flickr30k(str(tmp_path), str(ann))
        assert len(ds) == 1
        img, captions = ds[0]
        assert captions == ["first caption", "second"]

    def test_flickr8k(self, tmp_path, rng):
        write_jpeg(_img(rng), str(tmp_path / "123_abc.jpg"))
        # the real page puts the photo URL as the <a> text content
        html = (
            "<table><tr><td><a href=\"http://x/photos/123/\">http://x/photos/123/</a></td>"
            "<td><ul><li>cap one</li><li>cap two</li></ul></td></tr></table>")
        ann = tmp_path / "ann.html"
        ann.write_text(html)
        ds = datasets.Flickr8k(str(tmp_path), str(ann))
        assert len(ds) == 1
        _, captions = ds[0]
        assert captions == ["cap one", "cap two"]


def _make_frame_video(rng, root, n_frames):
    root.mkdir(parents=True)
    for i in range(n_frames):
        write_jpeg(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8),
                   str(root / f"frame_{i:04d}.jpg"))


class TestVideoDatasets:
    def test_kinetics(self, tmp_path, rng):
        _make_frame_video(rng, tmp_path / "train" / "surfing" / "vid0", 6)
        _make_frame_video(rng, tmp_path / "train" / "typing" / "vid1", 5)
        ds = datasets.Kinetics(str(tmp_path), frames_per_clip=4, split="train",
                               step_between_clips=2)
        assert len(ds) == 3  # vid0: starts 0,2; vid1: start 0
        video, audio, label = ds[0]
        assert video.shape == (4, 8, 8, 3) and audio is None

    def test_ucf101(self, tmp_path, rng):
        root = tmp_path / "videos"
        ann = tmp_path / "ann"
        ann.mkdir()
        _make_frame_video(rng, root / "ApplyEyeMakeup" / "v0", 4)
        _make_frame_video(rng, root / "Archery" / "v1", 4)
        (ann / "trainlist01.txt").write_text("ApplyEyeMakeup/v0 1\n")
        (ann / "testlist01.txt").write_text("Archery/v1\n")
        train = datasets.UCF101(str(root), str(ann), frames_per_clip=4, train=True)
        test = datasets.UCF101(str(root), str(ann), frames_per_clip=4, train=False)
        assert len(train) == 1 and len(test) == 1
        video, _, label = train[0]
        assert video.shape == (4, 8, 8, 3) and label == 0
        assert test[0][2] == 1

    def test_hmdb51(self, tmp_path, rng):
        root = tmp_path / "videos"
        ann = tmp_path / "ann"
        ann.mkdir()
        _make_frame_video(rng, root / "brush_hair" / "v0", 4)
        _make_frame_video(rng, root / "cartwheel" / "v1", 4)
        (ann / "brush_hair_test_split1.txt").write_text("v0 1\nv1 2\n")
        train = datasets.HMDB51(str(root), str(ann), frames_per_clip=4, train=True)
        test = datasets.HMDB51(str(root), str(ann), frames_per_clip=4, train=False)
        assert len(train) == 1 and len(test) == 1
        assert train[0][2] == 0 and test[0][2] == 1

    def test_npy_video(self, tmp_path, rng):
        d = tmp_path / "train" / "c"
        d.mkdir(parents=True)
        frames = rng.integers(0, 256, (5, 4, 4, 3), dtype=np.uint8)
        np.save(d / "v0.npy", frames)
        ds = datasets.Kinetics(str(tmp_path), frames_per_clip=3, split="train")
        video, _, _ = ds[0]
        np.testing.assert_array_equal(video, frames[:3])


def _write_flo(path, flow_hw2):
    import struct

    h, w, _ = flow_hw2.shape
    with open(path, "wb") as f:
        f.write(b"PIEH")
        f.write(struct.pack("<ii", w, h))
        f.write(flow_hw2.astype("<f4").tobytes())


def _write_pfm(path, arr_chw):
    c, h, w = arr_chw.shape
    data = np.flip(arr_chw.transpose(1, 2, 0), axis=0)
    if c == 1:
        header, body = b"Pf", data[:, :, 0]
    else:
        header, body = b"PF", data
    with open(path, "wb") as f:
        f.write(header + b"\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        f.write(body.astype("<f4").tobytes())


class TestFlowDatasets:
    def test_sintel(self, tmp_path, rng):
        base = tmp_path / "Sintel"
        imgd = base / "training" / "clean" / "scene1"
        flowd = base / "training" / "flow" / "scene1"
        imgd.mkdir(parents=True)
        flowd.mkdir(parents=True)
        for i in range(3):
            write_png(_img(rng, 8, 8), str(imgd / f"frame_{i:04d}.png"))
        for i in range(2):
            _write_flo(flowd / f"frame_{i:04d}.flo",
                       rng.normal(size=(8, 8, 2)).astype(np.float32))
        ds = datasets.Sintel(str(tmp_path), split="train")
        assert len(ds) == 2
        img1, img2, flow = ds[0]
        assert img1.shape == (8, 8, 3) and flow.shape == (2, 8, 8)

    def test_kitti_flow(self, tmp_path, rng):
        base = tmp_path / "KittiFlow" / "training"
        (base / "image_2").mkdir(parents=True)
        (base / "flow_occ").mkdir()
        write_png(_img(rng, 8, 8), str(base / "image_2" / "000000_10.png"))
        write_png(_img(rng, 8, 8), str(base / "image_2" / "000000_11.png"))
        raw = np.zeros((8, 8, 3), np.uint16)
        raw[:, :, 0] = 2**15 + 64 * 3  # u = 3.0
        raw[:, :, 1] = 2**15 - 64 * 2  # v = -2.0
        raw[:, :, 2] = 1
        write_png_16(str(base / "flow_occ" / "000000_10.png"), raw)
        ds = datasets.KittiFlow(str(tmp_path), split="train")
        img1, img2, flow, valid = ds[0]
        assert flow.shape == (2, 8, 8)
        np.testing.assert_allclose(flow[0], 3.0)
        np.testing.assert_allclose(flow[1], -2.0)
        assert valid.all()

    def test_flying_chairs(self, tmp_path, rng):
        from PIL import Image

        base = tmp_path / "FlyingChairs"
        (base / "data").mkdir(parents=True)
        for i in (1, 2):
            for j in (1, 2):
                Image.fromarray(_img(rng, 8, 8)).save(
                    base / "data" / f"{i:05d}_img{j}.ppm")
            _write_flo(base / "data" / f"{i:05d}_flow.flo",
                       rng.normal(size=(8, 8, 2)).astype(np.float32))
        (base / "FlyingChairs_train_val.txt").write_text("1\n2\n")
        train = datasets.FlyingChairs(str(tmp_path), split="train")
        val = datasets.FlyingChairs(str(tmp_path), split="val")
        assert len(train) == 1 and len(val) == 1
        img1, img2, flow = train[0]
        assert flow.shape == (2, 8, 8)

    def test_flying_things(self, tmp_path, rng):
        base = tmp_path / "FlyingThings3D"
        for d in ("frames_cleanpass", "optical_flow"):
            pass
        img_dir = base / "frames_cleanpass" / "TRAIN" / "A" / "0000" / "left"
        flow_dir = base / "optical_flow" / "TRAIN" / "A" / "0000" / "into_future" / "left"
        img_dir.mkdir(parents=True)
        flow_dir.mkdir(parents=True)
        for i in range(3):
            write_png(_img(rng, 8, 8), str(img_dir / f"{i:04d}.png"))
            _write_pfm(flow_dir / f"{i:04d}.pfm",
                       rng.normal(size=(3, 8, 8)).astype(np.float32))
        # into_past dirs must exist too (glob'd by the ctor)
        past = base / "optical_flow" / "TRAIN" / "A" / "0000" / "into_past" / "left"
        past.mkdir(parents=True)
        for i in range(3):
            _write_pfm(past / f"{i:04d}.pfm",
                       rng.normal(size=(3, 8, 8)).astype(np.float32))
        ds = datasets.FlyingThings3D(str(tmp_path), split="train")
        assert len(ds) == 4  # 2 into_future + 2 into_past
        img1, img2, flow = ds[0]
        assert flow.shape == (2, 8, 8)

    def test_hd1k(self, tmp_path, rng):
        base = tmp_path / "hd1k"
        (base / "hd1k_flow_gt" / "flow_occ").mkdir(parents=True)
        (base / "hd1k_input" / "image_2").mkdir(parents=True)
        for i in range(2):
            raw = np.zeros((8, 8, 3), np.uint16)
            raw[:, :, 0] = 2**15
            raw[:, :, 1] = 2**15
            raw[:, :, 2] = 1
            write_png_16(str(base / "hd1k_flow_gt" / "flow_occ"
                             / f"000000_{i:04d}.png"), raw)
            write_png(_img(rng, 8, 8),
                      str(base / "hd1k_input" / "image_2" / f"000000_{i:04d}.png"))
        ds = datasets.HD1K(str(tmp_path), split="train")
        assert len(ds) == 1
        img1, img2, flow, valid = ds[0]
        np.testing.assert_allclose(flow, 0.0)


class TestStereoDatasets:
    def test_carla(self, tmp_path, rng):
        scene = tmp_path / "carla-highres" / "trainingF" / "scene1"
        scene.mkdir(parents=True)
        write_png(_img(rng, 8, 8), str(scene / "im0.png"))
        write_png(_img(rng, 8, 8), str(scene / "im1.png"))
        disp = rng.uniform(0, 10, (1, 8, 8)).astype(np.float32)
        _write_pfm(scene / "disp0GT.pfm", disp)
        _write_pfm(scene / "disp1GT.pfm", disp)
        ds = datasets.CarlaStereo(str(tmp_path))
        left, right, d = ds[0]
        assert d.shape == (1, 8, 8)
        np.testing.assert_allclose(d, disp, rtol=1e-6)

    def test_kitti2015(self, tmp_path, rng):
        base = tmp_path / "Kitti2015" / "training"
        for sub in ("image_2", "image_3", "disp_occ_0", "disp_occ_1"):
            (base / sub).mkdir(parents=True)
        write_png(_img(rng, 8, 8), str(base / "image_2" / "000000_10.png"))
        write_png(_img(rng, 8, 8), str(base / "image_3" / "000000_10.png"))
        raw = (np.full((8, 8), 5.5) * 256).astype(np.uint16)
        write_png_16(str(base / "disp_occ_0" / "000000_10.png"), raw)
        write_png_16(str(base / "disp_occ_1" / "000000_10.png"), raw)
        ds = datasets.Kitti2015Stereo(str(tmp_path), split="train")
        left, right, disp, valid = ds[0]
        np.testing.assert_allclose(disp, 5.5)

    def test_instereo2k(self, tmp_path, rng):
        scene = tmp_path / "InStereo2k" / "train" / "s0"
        scene.mkdir(parents=True)
        write_png(_img(rng, 8, 8), str(scene / "left.png"))
        write_png(_img(rng, 8, 8), str(scene / "right.png"))
        raw = (np.full((8, 8), 2.0) * 1024).astype(np.uint16)
        write_png_16(str(scene / "left_disp.png"), raw)
        write_png_16(str(scene / "right_disp.png"), raw)
        ds = datasets.InStereo2k(str(tmp_path), split="train")
        left, right, disp = ds[0]
        np.testing.assert_allclose(disp, 2.0)

    def test_eth3d(self, tmp_path, rng):
        img_scene = tmp_path / "ETH3D" / "two_view_training" / "s0"
        gt_scene = tmp_path / "ETH3D" / "two_view_training_gt" / "s0"
        img_scene.mkdir(parents=True)
        gt_scene.mkdir(parents=True)
        write_png(_img(rng, 8, 8), str(img_scene / "im0.png"))
        write_png(_img(rng, 8, 8), str(img_scene / "im1.png"))
        _write_pfm(gt_scene / "disp0GT.pfm",
                   rng.uniform(0, 5, (1, 8, 8)).astype(np.float32))
        write_png(np.full((8, 8, 1), 255, np.uint8), str(gt_scene / "mask0nocc.png"))
        ds = datasets.ETH3DStereo(str(tmp_path), split="train")
        left, right, disp, valid = ds[0]
        assert disp.shape == (1, 8, 8) and np.asarray(valid).all()

    def test_middlebury(self, tmp_path, rng):
        scene = tmp_path / "Middlebury2014" / "train" / "Adirondack-perfect"
        scene.mkdir(parents=True)
        write_png(_img(rng, 8, 8), str(scene / "im0.png"))
        write_png(_img(rng, 8, 8), str(scene / "im1.png"))
        disp = rng.uniform(1, 5, (1, 8, 8)).astype(np.float32)
        _write_pfm(scene / "disp0.pfm", disp)
        _write_pfm(scene / "disp1.pfm", disp)
        ds = datasets.Middlebury2014Stereo(str(tmp_path), split="train")
        left, right, d, valid = ds[0]
        assert valid.shape == (8, 8) and valid.all()

    def test_crestereo(self, tmp_path, rng):
        for s in ("shapenet", "reflective", "tree", "hole"):
            d = tmp_path / "CREStereo" / s
            d.mkdir(parents=True)
            write_jpeg(_img(rng, 8, 8), str(d / "0_left.jpg"))
            write_jpeg(_img(rng, 8, 8), str(d / "0_right.jpg"))
            raw = (np.full((8, 8), 4.0) * 32).astype(np.uint16)
            write_png_16(str(d / "0_left.disp.png"), raw)
            write_png_16(str(d / "0_right.disp.png"), raw)
        ds = datasets.CREStereo(str(tmp_path))
        assert len(ds) == 4
        left, right, disp, valid = ds[0]
        np.testing.assert_allclose(disp, 4.0)

    def test_sceneflow(self, tmp_path, rng):
        base = tmp_path / "SceneFlow" / "Monkaa"
        img = base / "frames_cleanpass" / "scene1"
        dsp = base / "disparity" / "scene1"
        for side in ("left", "right"):
            (img / side).mkdir(parents=True)
            (dsp / side).mkdir(parents=True)
            write_png(_img(rng, 8, 8), str(img / side / "0000.png"))
            _write_pfm(dsp / side / "0000.pfm",
                       rng.uniform(0, 5, (1, 8, 8)).astype(np.float32))
        ds = datasets.SceneFlowStereo(str(tmp_path), variant="Monkaa")
        left, right, disp = ds[0]
        assert disp.shape == (1, 8, 8)

    def test_falling_things(self, tmp_path, rng):
        scene = tmp_path / "FallingThings" / "mixed" / "scene1"
        scene.mkdir(parents=True)
        write_jpeg(_img(rng, 8, 8), str(scene / "img1.left.jpg"))
        write_jpeg(_img(rng, 8, 8), str(scene / "img1.right.jpg"))
        depth = np.full((8, 8), 6000, np.uint16)
        write_png_16(str(scene / "img1.left.depth.png"), depth)
        write_png_16(str(scene / "img1.right.depth.png"), depth)
        (scene / "_camera_settings.json").write_text(json.dumps(
            {"camera_settings": [{"intrinsic_settings": {"fx": 10.0}}]}))
        ds = datasets.FallingThingsStereo(str(tmp_path), variant="mixed")
        left, right, disp = ds[0]
        np.testing.assert_allclose(disp, 6 * 10.0 * 100 / 6000)

    def test_sintel_stereo(self, tmp_path, rng):
        base = tmp_path / "Sintel" / "training"
        for sub in ("final_left", "final_right", "disparities", "occlusions",
                    "outofframe"):
            (base / sub / "scene1").mkdir(parents=True)
        write_png(_img(rng, 8, 8), str(base / "final_left" / "scene1" / "f0.png"))
        write_png(_img(rng, 8, 8), str(base / "final_right" / "scene1" / "f0.png"))
        disp_rgb = np.zeros((8, 8, 3), np.uint8)
        disp_rgb[:, :, 0] = 2  # disparity = 8
        write_png(disp_rgb, str(base / "disparities" / "scene1" / "f0.png"))
        write_png(np.zeros((8, 8, 1), np.uint8),
                  str(base / "occlusions" / "scene1" / "f0.png"))
        write_png(np.zeros((8, 8, 1), np.uint8),
                  str(base / "outofframe" / "scene1" / "f0.png"))
        ds = datasets.SintelStereo(str(tmp_path), pass_name="final")
        left, right, disp, valid = ds[0]
        np.testing.assert_allclose(disp, 8.0)
        assert valid.all()


class TestWrapper:
    def test_coco_wrap(self, tmp_path, rng):
        img_dir = tmp_path / "images"
        img_dir.mkdir()
        write_jpeg(_img(rng, 32, 48), str(img_dir / "0.jpg"))
        ann = {"images": [{"id": 0, "file_name": "0.jpg", "height": 32, "width": 48}],
               "annotations": [{"id": 1, "image_id": 0, "category_id": 7,
                                "bbox": [2, 3, 10, 12], "area": 120, "iscrowd": 0}],
               "categories": [{"id": 7, "name": "thing"}]}
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps(ann))
        ds = datasets.wrap_dataset_for_transforms_v2(
            datasets.CocoDetection(str(img_dir), str(ann_file)))
        from cpu_vision_tpu.tv_arrays import BoundingBoxes, Image

        img, target = ds[0]
        assert isinstance(img, Image)
        assert isinstance(target["boxes"], BoundingBoxes)
        np.testing.assert_allclose(np.asarray(target["boxes"].data),
                                   [[2, 3, 12, 15]])
        assert target["boxes"].canvas_size == (32, 48)
        assert target["labels"].tolist() == [7]

    def test_classification_wrap(self, tmp_path, rng):
        d = tmp_path / "c0"
        d.mkdir()
        write_jpeg(_img(rng), str(d / "x.jpg"))
        ds = datasets.wrap_dataset_for_transforms_v2(
            datasets.ImageFolder(str(tmp_path)))
        from cpu_vision_tpu.tv_arrays import Image

        img, label = ds[0]
        assert isinstance(img, Image) and label == 0
        assert len(ds) == 1


class TestLSUNGated:
    def test_lsun_requires_lmdb(self, tmp_path):
        try:
            import lmdb  # noqa: F401
            pytest.skip("lmdb installed")
        except ImportError:
            pass
        with pytest.raises(RuntimeError, match="lmdb"):
            datasets.LSUNClass(str(tmp_path))
