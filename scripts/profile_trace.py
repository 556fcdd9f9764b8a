"""Capture a device trace of the batch frame pipeline and print the
top-k ops by self time (parses the xplane.pb protobuf by wire format —
no tensorflow dependency needed)."""
import glob
import os
import struct
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XIVO_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import jax.numpy as jnp
import numpy as np

from xivo_tpu.filter.config import config_from_json
from xivo_tpu.runner import batch_states, make_batch_runner
from xivo_tpu.sim.stream import build_pcw_stream
from tests.test_e2e_pcw import PCW_CFG

B = int(os.environ.get("BENCH_BATCH", "128"))
OUT = "/tmp/xivo_trace"

cfg = config_from_json(PCW_CFG, dtype="float32", sim_initialize_depths=True,
                       propagation_mode="fast")
fi, gt = build_pcw_stream(cfg, total_time=5.0, noise_px=0.25)
s0 = batch_states(cfg, B)
dt = np.dtype(cfg.dtype)
s0 = s0._replace(
    last_gyro=jnp.broadcast_to(jnp.asarray(gt["gyro0"], dt), (B, 3)).copy(),
    last_accel=jnp.broadcast_to(jnp.asarray(gt["accel0"], dt), (B, 3)).copy())
fib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), fi)
run = make_batch_runner(cfg)
s, outs = run(s0, fib)
jax.block_until_ready(outs.Tsb)

with jax.profiler.trace(OUT):
    s2, outs2 = run(s0, fib)
    jax.block_until_ready(outs2.Tsb)

# ---- minimal xplane.pb reader ----------------------------------------
# XSpace proto: field 1 = repeated XPlane. XPlane: 1=id, 2=name,
# 3=repeated XLine, 4=event_metadata map<int64, XEventMetadata>,
# 5=stat_metadata. XLine: 6? events... We avoid full schema: we use
# event_metadata (field 4) name table and XEvent durations.
#
# Simpler: protobuf wire-walk collecting (metadata_id -> name) from
# XEventMetadata {1=id, 2=name} and events XEvent {1=metadata_id,
# ... 3=duration_ps} per line.


def read_varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_no, wire_type, value_bytes_or_int) over a message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = read_varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = read_varint(buf, i)
            yield fno, wt, v
        elif wt == 1:
            yield fno, wt, buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = read_varint(buf, i)
            yield fno, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fno, wt, buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")


files = glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True)
assert files, f"no xplane.pb under {OUT}"
path = max(files, key=os.path.getmtime)
space = open(path, "rb").read()
print(f"trace: {path} ({len(space)} bytes)")

tot = defaultdict(int)
for fno, wt, plane in fields(space):
    if fno != 1:
        continue
    pname = ""
    meta = {}
    lines = []
    for f2, w2, v in fields(plane):
        if f2 == 2:
            pname = v.decode()
        elif f2 == 4:  # map<int64, XEventMetadata>
            mid, mname = None, ""
            for f3, w3, v3 in fields(v):
                if f3 == 1:
                    mid = v3
                elif f3 == 2:  # XEventMetadata
                    for f4, w4, v4 in fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 2:
                            mname = v4.decode(errors="replace")
            if mid is not None:
                meta[mid] = mname
        elif f2 == 3:
            lines.append(v)
    if "TPU" not in pname and "tpu" not in pname.lower():
        continue
    for line in lines:
        for f3, w3, v in fields(line):
            if f3 != 6:   # XEvent
                continue
            mid, dur = None, 0
            for f4, w4, v4 in fields(v):
                if f4 == 1:
                    mid = v4
                elif f4 == 3:
                    dur = v4
            if mid is not None:
                tot[meta.get(mid, str(mid))] += dur

top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
tsum = sum(tot.values())
print(f"total device event time: {tsum / 1e9:.3f} ms")
for name, ps in top:
    print(f"{ps / 1e9:10.3f} ms  {100 * ps / tsum:5.1f}%  {name[:110]}")
