"""CLI replay app: ASL-format dataset -> trajectory file.

Port of the reference `vio` binary (src/app/vio.cpp): loads an
ASL-compatible dataset, replays messages in timestamp order through the
estimator, optionally triggers loop closure, writes the trajectory.

Usage:
  python scripts/vio.py -cfg cfg/tumvi_cam0.json -root /data/tumvi \
      -dataset tumvi -seq room1 -cam_id 0 -out out_state
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("XIVO_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["XIVO_PLATFORM"])
    if os.environ["XIVO_PLATFORM"] == "cpu":
        jax.config.update("jax_enable_x64", True)

import numpy as np

from xivo_tpu.api import Estimator
from xivo_tpu.io import load_dataset, ImageMsg, IMUMsg, TrajectoryWriter
from xivo_tpu.filter.config import load_json_with_comments


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-cfg", default="cfg/tumvi_cam0.json")
    ap.add_argument("-root", required=True)
    ap.add_argument("-dataset", default="tumvi")
    ap.add_argument("-seq", default="room1")
    ap.add_argument("-cam_id", type=int, default=0)
    ap.add_argument("-out", default="out_state")
    ap.add_argument("-dtype", default="float32")
    ap.add_argument("-max_frames", type=int, default=-1)
    ap.add_argument("-graphout", default="",
                    help="dump the visibility graph as Graphviz .dot "
                         "(reference -graphout, src/app/vio.cpp:27)")
    ap.add_argument("-delivery_jitter_ms", type=float, default=0.0,
                    help="perturb message DELIVERY order by up to this "
                         "many ms (timestamps untouched) — exercises "
                         "the reorder buffer the way real sensor "
                         "transport does; needs message_buffer_size>0 "
                         "in the config")
    ap.add_argument("-jitter_seed", type=int, default=0)
    args = ap.parse_args()

    cfg = load_json_with_comments(args.cfg)
    est = Estimator(cfg, dtype=args.dtype)
    entries = load_dataset(args.root, args.dataset, args.seq, args.cam_id)
    if args.delivery_jitter_ms > 0:
        rng = np.random.default_rng(args.jitter_seed)
        keys = [m.ts + rng.uniform(0, args.delivery_jitter_ms * 1e-3)
                for m in entries]
        entries = [m for _, m in sorted(zip(keys, entries),
                                        key=lambda p: p[0])]
    writer = TrajectoryWriter(args.out)

    t0 = time.time()
    nf = 0
    for msg in entries:
        if isinstance(msg, IMUMsg):
            est.InertialMeas(msg.ts, msg.gyro, msg.accel)
        else:
            est.VisualMeas(msg.ts, msg.image())
            nf += 1
            Rsb, Tsb = est.gsb()
            writer.add(msg.ts, Rsb, Tsb)
            if args.max_frames > 0 and nf >= args.max_frames:
                break
    est.flush()                     # drain the reorder-buffer tail
    wall = time.time() - t0
    writer.write()
    if args.graphout:
        from xivo_tpu.viz import write_graphviz
        write_graphviz(est, args.graphout)
    print(f"frames={nf} wall={wall:.1f}s fps={nf / max(wall, 1e-9):.1f} "
          f"misordered_dropped={est.num_misordered_dropped()} "
          f"td={float(est.td()):+.4f}s "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
