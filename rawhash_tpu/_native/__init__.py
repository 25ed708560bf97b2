"""On-demand-built native (C++) host runtime components.

The TPU owns the compute path; the sequential host tail (chain backtracking
and compaction — the reference's pointer-walking loops, lchain.c:95-281) is
native C++ for throughput, compiled once with g++ and cached by source hash.
Falls back to the numpy implementation when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build_lib():
    src = os.path.join(_HERE, "chain_tail.cpp")
    with open(src, "rb") as fp:
        tag = hashlib.sha256(fp.read()).hexdigest()[:16]
    cache = os.environ.get(
        "RAWHASH_TPU_NATIVE_CACHE",
        os.path.expanduser("~/.cache/rawhash_tpu_native"),
    )
    os.makedirs(cache, exist_ok=True)
    lib_path = os.path.join(cache, f"chain_tail_{tag}.so")
    if not os.path.exists(lib_path):
        tmp = lib_path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-march=native", src, "-o", tmp,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, lib_path)
    lib = ctypes.CDLL(lib_path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.rh_chain_tail.restype = ctypes.c_int32
    lib.rh_chain_tail.argtypes = [
        i32p, i32p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        u64p, u64p,
        i64p, u64p, u64p, u64p, u64p,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rh_gen_regions.restype = ctypes.c_int32
    lib.rh_gen_regions.argtypes = [
        ctypes.c_uint32, ctypes.c_int32,
        i64p, u64p, u64p,
        ctypes.c_double, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        ctypes.c_int32, ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
        i64p,
    ]
    return lib


def get_lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build_lib()
        except Exception as e:  # no toolchain / build failure -> python path
            print(
                f"[rawhash-tpu] native chain tail unavailable ({e}); "
                "using the numpy fallback",
                file=sys.stderr,
            )
            _LIB = None
    return _LIB


def chain_tail_native(f, p, ax, ay, min_cnt, min_sc, max_drop):
    """Native backtrack+compact; returns (u [(score,cnt)] target-sorted,
    bx, by, px, py) like chain.host.chain_backtrack+compact_chains."""
    lib = get_lib()
    if lib is None:
        return None
    n = f.shape[0]
    f = np.ascontiguousarray(f, dtype=np.int32)
    p32 = np.ascontiguousarray(p, dtype=np.int32)
    ax = np.ascontiguousarray(ax, dtype=np.uint64)
    ay = np.ascontiguousarray(ay, dtype=np.uint64)
    u_out = np.zeros(2 * max(n, 1), dtype=np.int64)
    bx = np.zeros(max(n, 1), dtype=np.uint64)
    by = np.zeros(max(n, 1), dtype=np.uint64)
    px = np.zeros(max(n, 1), dtype=np.uint64)
    py = np.zeros(max(n, 1), dtype=np.uint64)
    n_v = ctypes.c_int32(0)
    n_u = lib.rh_chain_tail(
        f, p32, np.int32(n), np.int32(min_cnt), np.int32(min_sc),
        np.int32(max_drop), ax, ay, u_out, bx, by, px, py,
        ctypes.byref(n_v),
    )
    nv = int(n_v.value)
    u = u_out[: 2 * n_u].reshape(n_u, 2)
    return u, bx[:nv], by[:nv], px[:nv], py[:nv]


def gen_regions_native(
    read_hash, u, bx, by,
    mask_level, mask_len, hard_mask_level, alt_diff_frac,
    do_select, pri_ratio, best_n, check_strand, min_strand_sc,
):
    """Native regions pipeline: gen_regs -> set_parent -> [select_sub+sync].
    Returns a list of chain.regions.Region (already pruned), or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..chain.regions import Region

    n_u = int(u.shape[0])
    if n_u == 0:
        return []
    u64 = np.ascontiguousarray(u.reshape(-1), dtype=np.int64)
    bx = np.ascontiguousarray(bx, dtype=np.uint64)
    by = np.ascontiguousarray(by, dtype=np.uint64)
    out = np.zeros(n_u * 20, dtype=np.int64)
    n_keep = lib.rh_gen_regions(
        ctypes.c_uint32(read_hash & 0xFFFFFFFF), np.int32(n_u),
        u64, bx, by,
        float(mask_level), np.int32(mask_len), np.int32(hard_mask_level),
        float(alt_diff_frac),
        np.int32(do_select), float(pri_ratio), np.int32(best_n),
        np.int32(check_strand), np.int32(min_strand_sc),
        out,
    )
    rows = out[: n_keep * 20].reshape(n_keep, 20)
    return [
        Region(
            id=int(r[0]), parent=int(r[1]), score=int(r[2]), score0=int(r[3]),
            hash=int(r[4]), cnt=int(r[5]), as_=int(r[6]), rev=int(r[7]),
            rid=int(r[8]), rs=int(r[9]), re=int(r[10]), qs=int(r[11]),
            qe=int(r[12]), mlen=int(r[13]), blen=int(r[14]), n_sub=int(r[15]),
            subsc=int(r[16]), inv=int(r[17]), is_alt=int(r[18]),
            strand_retained=int(r[19]),
        )
        for r in rows
    ]
