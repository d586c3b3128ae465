"""Slow scalar NumPy oracles for the RoI ops — transcriptions of the
reference C++ kernels' loop semantics (the reference's own test strategy:
``test/test_ops.py`` RoIOpTester uses in-test Python references).

Layout: NCHW like the C++ (tests convert)."""

import math

import numpy as np


def bilinear(data, h, w, y, x):
    """roi_align_common.h:35-78 semantics."""
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low = int(y)
    x_low = int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    return (
        hy * hx * data[y_low, x_low]
        + hy * lx * data[y_low, x_high]
        + ly * hx * data[y_high, x_low]
        + ly * lx * data[y_high, x_high]
    )


def roi_align(x_nchw, rois, out_size, spatial_scale=1.0, sampling_ratio=-1, aligned=False):
    """csrc/ops/cpu/roi_align_kernel.cpp:12-108."""
    n, c, h, w = x_nchw.shape
    ph_out, pw_out = (out_size, out_size) if isinstance(out_size, int) else out_size
    k = rois.shape[0]
    out = np.zeros((k, c, ph_out, pw_out), np.float32)
    offset = 0.5 if aligned else 0.0
    for i in range(k):
        b = int(rois[i, 0])
        sw = rois[i, 1] * spatial_scale - offset
        sh = rois[i, 2] * spatial_scale - offset
        ew = rois[i, 3] * spatial_scale - offset
        eh = rois[i, 4] * spatial_scale - offset
        rw = ew - sw
        rh = eh - sh
        if not aligned:
            rw = max(rw, 1.0)
            rh = max(rh, 1.0)
        bh = rh / ph_out
        bw = rw / pw_out
        gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(rh / ph_out))
        gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(rw / pw_out))
        count = max(gh * gw, 1)
        for ci in range(c):
            data = x_nchw[b, ci]
            for ph in range(ph_out):
                for pw in range(pw_out):
                    acc = 0.0
                    for iy in range(gh):
                        y = sh + ph * bh + (iy + 0.5) * bh / gh
                        for ix in range(gw):
                            xx = sw + pw * bw + (ix + 0.5) * bw / gw
                            acc += bilinear(data, h, w, y, xx)
                    out[i, ci, ph, pw] = acc / count
    return out


def roi_pool(x_nchw, rois, out_size, spatial_scale=1.0):
    """csrc/ops/cpu/roi_pool_kernel.cpp."""
    n, c, h, w = x_nchw.shape
    ph_out, pw_out = (out_size, out_size) if isinstance(out_size, int) else out_size
    k = rois.shape[0]
    out = np.zeros((k, c, ph_out, pw_out), np.float32)
    for i in range(k):
        b = int(rois[i, 0])
        sw = round(rois[i, 1] * spatial_scale)
        sh = round(rois[i, 2] * spatial_scale)
        ew = round(rois[i, 3] * spatial_scale)
        eh = round(rois[i, 4] * spatial_scale)
        rw = max(ew - sw + 1, 1)
        rh = max(eh - sh + 1, 1)
        bh = rh / ph_out
        bw = rw / pw_out
        for ph in range(ph_out):
            for pw in range(pw_out):
                hstart = int(math.floor(ph * bh)) + sh
                hend = int(math.ceil((ph + 1) * bh)) + sh
                wstart = int(math.floor(pw * bw)) + sw
                wend = int(math.ceil((pw + 1) * bw)) + sw
                hstart = min(max(hstart, 0), h)
                hend = min(max(hend, 0), h)
                wstart = min(max(wstart, 0), w)
                wend = min(max(wend, 0), w)
                empty = hend <= hstart or wend <= wstart
                for ci in range(c):
                    if empty:
                        out[i, ci, ph, pw] = 0.0
                    else:
                        out[i, ci, ph, pw] = x_nchw[b, ci, hstart:hend, wstart:wend].max()
    return out


def ps_roi_align(x_nchw, rois, out_size, spatial_scale=1.0, sampling_ratio=-1):
    """csrc/ops/cpu/ps_roi_align_kernel.cpp:84-140."""
    n, c, h, w = x_nchw.shape
    ph_out, pw_out = (out_size, out_size) if isinstance(out_size, int) else out_size
    c_out = c // (ph_out * pw_out)
    k = rois.shape[0]
    out = np.zeros((k, c_out, ph_out, pw_out), np.float32)
    for i in range(k):
        b = int(rois[i, 0])
        sw = rois[i, 1] * spatial_scale - 0.5
        sh = rois[i, 2] * spatial_scale - 0.5
        ew = rois[i, 3] * spatial_scale - 0.5
        eh = rois[i, 4] * spatial_scale - 0.5
        rw = ew - sw
        rh = eh - sh
        bh = rh / ph_out
        bw = rw / pw_out
        c_in = 0
        for co in range(c_out):
            for ph in range(ph_out):
                for pw in range(pw_out):
                    hstart = ph * bh + sh
                    wstart = pw * bw + sw
                    gh = sampling_ratio if sampling_ratio > 0 else int(math.ceil(rh / ph_out))
                    gw = sampling_ratio if sampling_ratio > 0 else int(math.ceil(rw / pw_out))
                    count = gh * gw
                    data = x_nchw[b, c_in]
                    acc = 0.0
                    for iy in range(gh):
                        y = hstart + (iy + 0.5) * bh / gh
                        for ix in range(gw):
                            xx = wstart + (ix + 0.5) * bw / gw
                            acc += bilinear(data, h, w, y, xx)
                    out[i, co, ph, pw] = acc / count
                    c_in += 1
    return out


def nms(boxes, scores, thr):
    """csrc/ops/cpu/nms_kernel.cpp:48-75 — returns keep mask."""
    n = boxes.shape[0]
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(n, bool)
    keep = np.zeros(n, bool)
    for oi in range(n):
        i = order[oi]
        if suppressed[i]:
            continue
        keep[i] = True
        for oj in range(oi + 1, n):
            j = order[oj]
            if suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            wq = max(0.0, xx2 - xx1)
            hq = max(0.0, yy2 - yy1)
            inter = wq * hq
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a_i + a_j - inter) > thr:
                suppressed[j] = True
    return keep
