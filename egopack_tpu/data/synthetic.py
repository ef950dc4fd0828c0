"""Synthetic Ego4D fixture generator.

Produces annotation JSONs and feature arrays in exactly the on-disk schema the
real pipeline consumes (fho_lta_{split}.json fields per
/root/reference/data/ego4d_fho.py:60-67, fho_oscc-pnr_{split}.json fields per
/root/reference/data/ego4d_oscc.py:75-108), so every layer from dataset parsing
to the two-phase trainers runs hermetically. The reference repo has no test
fixtures at all (SURVEY.md §4) — this generator is what makes the rebuilt
framework testable and benchmarkable without the 600GB Ego4D release.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np

from .ego4d import FEATURE_STRIDES, FPS


def generate_ego4d_fixture(root: str,
                           features: str = "omnivore_video_swinl",
                           feature_dim: int = 64,
                           n_videos: int = 2,
                           actions_per_clip: int = 30,
                           n_verbs: int = 12,
                           n_nouns: int = 9,
                           n_oscc: int = 24,
                           splits: tuple = ("train", "val", "test_unannotated"),
                           seed: int = 0) -> str:
    """Write a miniature Ego4D tree under ``root``; returns ``root``.

    The feature registry dimension is NOT enforced here — datasets read dims
    from the arrays; tests use small dims, the benchmark uses 1536.
    """
    rng = np.random.default_rng(seed)
    stride = FEATURE_STRIDES[features]

    ann_dir = osp.join(root, "raw", "annotations", "v1")
    feat_dir = osp.join(root, "processed", "features", features)
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(feat_dir, exist_ok=True)

    taxonomy = {
        "verbs": [f"verb_{i}" for i in range(n_verbs)],
        "nouns": [f"noun_{i}" for i in range(n_nouns)],
    }
    with open(osp.join(ann_dir, "fho_lta_taxonomy.json"), "w") as f:
        json.dump(taxonomy, f)

    video_uids = [f"vid_{i:04d}" for i in range(n_videos)]
    # ~45 frames per action → feature rows per video
    frames_per_action = 45
    video_frames = actions_per_clip * frames_per_action + 200
    for uid in video_uids:
        rows = video_frames // stride + 2
        feats = rng.normal(size=(rows, feature_dim)).astype(np.float32)
        np.save(osp.join(feat_dir, f"{uid}.npy"), feats)

    for split in splits:
        fho_clips = []
        unannotated = "test" in split
        for v, uid in enumerate(video_uids):
            clip_uid = f"clip_{split}_{v:04d}"
            for a in range(actions_per_clip):
                start = a * frames_per_action
                end = start + frames_per_action - 5
                entry = {
                    "action_idx": a,
                    "video_uid": uid,
                    "clip_uid": clip_uid,
                    "clip_parent_start_frame": 0,
                    "action_clip_start_frame": start,
                    "action_clip_end_frame": end,
                }
                if not unannotated:  # test splits carry no labels
                    entry["verb_label"] = int(rng.integers(0, n_verbs))
                    entry["noun_label"] = int(rng.integers(0, n_nouns))
                fho_clips.append(entry)
        with open(osp.join(ann_dir, f"fho_lta_{split}.json"), "w") as f:
            json.dump({"clips": fho_clips}, f)
        if unannotated:
            continue  # no OSCC/PNR annotations for test splits

        oscc_clips = []
        for i in range(n_oscc):
            uid = video_uids[i % n_videos]
            start_sec = float(rng.uniform(0, (video_frames / FPS) - 9))
            end_sec = start_sec + 8.0
            start_frame = int(start_sec * FPS)
            end_frame = int(end_sec * FPS)
            state_change = int(i % 2 == 0)
            entry = {
                "video_uid": uid,
                "unique_id": f"oscc_{split}_{i:05d}",
                "parent_start_frame": start_frame,
                "parent_end_frame": end_frame,
                "parent_start_sec": start_sec,
                "parent_end_sec": end_sec,
                "state_change": state_change,
                "parent_pnr_frame": (int(rng.integers(start_frame + 10,
                                                      end_frame - 10))
                                     if state_change else None),
            }
            oscc_clips.append(entry)
        with open(osp.join(ann_dir, f"fho_oscc-pnr_{split}.json"), "w") as f:
            json.dump({"clips": oscc_clips}, f)

    return root
