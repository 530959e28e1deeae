"""Distill a reference baseline run into a compact committed digest.

Reads the gpickle artifacts a reference-pipeline run wrote (default
/tmp/ref_baseline/src/output — produce it with `tools/make_ref_baseline.py
--run`, ~3 min) and extracts exactly the quantities the parity check
compares, keyed by original TrackML node ids:

- seed:    per-edge track_state_estimates after event conversion
           (reference `src/utilities/helper.py:432-450` schema, written by
           `helper.py:585-587`)
- cluster1: merged_state/merged_cov per node after clustering iteration 1
           (`src/clustering/clustering.py:289-293`)
- leak:    nodes whose GNN_Measurement coordinates diverge from the
           immutable 'xyzr' node attribute in iteration_1/remaining —
           the close-proximity-merge in-place mutation
           (`src/extract/extract_track_candidates.py:86-97`)
- extrap2: updated_track_states per edge after extrapolation iteration 2
           (`src/extrapolate/extrapolate_merged_states.py:441-447`)

Writes tests/data/ref_digest.npz (compressed, ~1 MB) so the parity test
(tests/test_reference_artifacts.py) runs hermetically on a wiped machine.

Usage: python tools/make_ref_digest.py [REF_OUTPUT_DIR] [OUT_NPZ]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.validate_vs_reference import _ref_sys_path, load_ref_graphs  # noqa: E402


def build_digest(ref_root: str) -> dict:
    _ref_sys_path(ref_root)
    out = {}

    # ---- seed states ----
    src, dst, sv, cov, joint = [], [], [], [], []
    for G in load_ref_graphs(os.path.join(ref_root, "track_sim", "network")):
        for node, attr in G.nodes(data=True):
            for nb, st in attr.get("track_state_estimates", {}).items():
                src.append(int(nb))
                dst.append(int(node))
                sv.append(np.asarray(st["edge_state_vector"], np.float64))
                cov.append(np.asarray(st["edge_covariance"], np.float64))
                joint.append(np.asarray(st["joint_vector"], np.float64))
    out["seed_src"] = np.asarray(src, np.int64)
    out["seed_dst"] = np.asarray(dst, np.int64)
    out["seed_sv"] = np.stack(sv)
    out["seed_cov"] = np.stack(cov)
    out["seed_joint"] = np.stack(joint)

    # ---- clustering iteration 1 merged states ----
    nid, has, msv, mcov, mprior = [], [], [], [], []
    for G in load_ref_graphs(os.path.join(ref_root, "iteration_1", "network")):
        for node, attr in G.nodes(data=True):
            nid.append(int(node))
            m = "merged_state" in attr
            has.append(m)
            if m:
                msv.append(np.asarray(attr["merged_state"], np.float64))
                mcov.append(np.asarray(attr["merged_cov"], np.float64))
                mprior.append(float(attr["merged_prior"]))
    out["clus_node"] = np.asarray(nid, np.int64)
    out["clus_has_merged"] = np.asarray(has, bool)
    out["clus_merged_sv"] = np.stack(msv)
    out["clus_merged_cov"] = np.stack(mcov)
    out["clus_merged_prior"] = np.asarray(mprior, np.float64)

    # ---- extraction coordinate leak (iteration_1/remaining) ----
    lid, lco = [], []
    for G in load_ref_graphs(os.path.join(ref_root, "iteration_1",
                                          "remaining")):
        for node, attr in G.nodes(data=True):
            gm = attr["GNN_Measurement"]
            if abs(gm.x - attr["xyzr"][0]) > 1e-12 or \
                    abs(gm.z - attr["xyzr"][2]) > 1e-12:
                lid.append(int(node))
                lco.append([gm.x, gm.y, gm.z, gm.r])
    out["leak_node"] = np.asarray(lid, np.int64)
    out["leak_coords"] = np.asarray(lco, np.float64)

    # ---- extrapolation iteration 2 updated states ----
    usrc, udst, usv, ujoint = [], [], [], []
    for G in load_ref_graphs(os.path.join(ref_root, "iteration_2", "network")):
        for node, attr in G.nodes(data=True):
            for snd, st in attr.get("updated_track_states", {}).items():
                usrc.append(int(snd))
                udst.append(int(node))
                usv.append(np.asarray(st["edge_state_vector"], np.float64))
                ujoint.append(np.asarray(st["joint_vector"], np.float64))
    out["upd_src"] = np.asarray(usrc, np.int64)
    out["upd_dst"] = np.asarray(udst, np.int64)
    out["upd_sv"] = np.stack(usv)
    out["upd_joint"] = np.stack(ujoint)
    return out


def main() -> None:
    ref_root = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/ref_baseline/src/output"
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "data", "ref_digest.npz")
    if not os.path.isdir(os.path.join(ref_root, "track_sim", "network")):
        print(f"no reference artifacts under {ref_root}; "
              "run tools/make_ref_baseline.py --run first")
        sys.exit(1)
    d = build_digest(ref_root)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **d)
    sz = os.path.getsize(out_path)
    print(f"wrote {out_path} ({sz / 1e6:.2f} MB): "
          f"{len(d['seed_src'])} seed edges, "
          f"{int(d['clus_has_merged'].sum())} merged nodes, "
          f"{len(d['leak_node'])} leaked coords, "
          f"{len(d['upd_src'])} updated states")


if __name__ == "__main__":
    main()
