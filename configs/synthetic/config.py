"""Synthetic-scene experiment config (test/bench workload).

Same config surface as the dataset profiles (see configs/replica/
config.py); sized for quick end-to-end runs without external data.
"""
import os

seed = int(os.environ.get("SEED", 0))
h = int(os.environ.get("SYN_H", 120))
w = int(os.environ.get("SYN_W", 160))
num_frames = int(os.environ.get("SYN_FRAMES", 30))
trans_lr_base = 0.002
rot_lr_base = 0.0004
num_tracking_iter = int(os.environ.get("SYN_TRACK_ITERS", 30))
num_mapping_iters = int(os.environ.get("SYN_MAP_ITERS", 20))
num_ba_iters = int(os.environ.get("SYN_BA_ITERS", 20))
# submap length: cuts (LocalMap.cut + merge + create_map) are the most
# expensive events in a run; the reference's Replica profile uses 40
# (configs/replica/config.py:28) — the A/B sweeps this shape knob
localmap_max_frames = int(os.environ.get("SYN_MAX_FRAMES", 10))
# resolution interpolant for the backend-capacity trajectory arithmetic
# below: 0 at the 340x600 bench shape, 1 at 680x1200
_res = min(max((h * w - 204_000) / (816_000 - 204_000), 0.0), 1.0)

config = dict(
    vis_base_dir=os.environ.get("SYN_OUT", f"output/synthetic_seed{seed}"),
    seed=seed,
    use_wandb=False,
    wandb=dict(name="synthetic", project_name="gaus_slam_tpu"),
    render=dict(
        method="2dgs",
        use_sa=True,
        use_weight_norm=True,
        enable_exposure=False,
        eps=1e-6,
        depth_far=1e2,
        depth_near=1e-2,
    ),
    frontend=dict(
        num_tracking_iters=num_tracking_iter,
        num_mapping_iters=num_mapping_iters,
        # reference Replica profile disables the early exit (-1);
        # the synthetic default keeps it (quality-validated)
        converged_th=float(os.environ.get("SYN_CONV_TH", 5e-4)),
        # coarse-to-fine tracking: first iterations render a strided
        # tile checkerboard (1/stride^2 the kernel work) from the same
        # pair cache. Stride 3 adopted round 5: the clean cs3r4 rows
        # measured it BETTER than 2 at 340x600 (39.09+-0.44 vs
        # 38.64+-0.56, artifacts/quality_ab_r5.jsonl); the fullres
        # anchor row "cs2f" gates the flip at 680x1200.
        coarse_iters=int(os.environ.get("COARSE_ITERS", 18)),
        coarse_stride=int(os.environ.get("COARSE_STRIDE", 3)),
        # pyramid coarse schedule "i1xs1,i2xs2" (e.g. "10x4,14x2"):
        # multiple nested coarse levels from one phase-major cache;
        # supersedes coarse_iters/coarse_stride when set
        coarse_levels=[
            tuple(int(v) for v in lvl.split("x"))
            for lvl in os.environ.get("COARSE_LEVELS", "").split(",")
            if lvl
        ],
        # re-bin the tracking pair cache once mid-loop (after the coarse
        # phase) at the updated pose — A/B knob for the cache-staleness
        # question (reference re-bins every iteration)
        tracking_refresh=bool(int(os.environ.get("TRACK_REFRESH", 0))),
        tau_k=float(os.environ.get("SYN_TAU_K", 0.05)),
        tau_l=h * w * 1.5,
        max_frames=localmap_max_frames,
        vel_pose_init=True,
        enable_retracking=False,
        additional_densify=False,
    ),
    backend=dict(
        num_ba_iters=num_ba_iters,
        num_frame_saved=max(localmap_max_frames // 4, 2),
        num_covis_submaps=5,
        sleep_time=0.01,
        mesh_vis=False,
        render_vis=False,
        common_vis=False,
        gs_densify=False,
        random_process=True,
        final_refinement=0,
    ),
    densify=dict(
        use_edge_growth=False,
        densify_interval=20,
        method="splatam",
        sil_thres=0.6,
        edge_thres=0.4,
        dep_thres=0.1,
        opacity_cuil=0.05,
        scale_cuil=5e-4,
        scale_max=0.1,
        num_addpts=h * w,
        percent_dense=0.01,
        densify_grad_threshold=2e-4,
        extent=2,
    ),
    loss=dict(
        ignore_outliners=False,
        use_normal_loss=False,
        silmask_th=0.90,
        tracking=dict(color=0.5, depth=1.0, normal=0),
        mapping=dict(color=0.5, depth=1.0, normal=0, dist=0.1),
    ),
    data=dict(
        dataset_name="synthetic",
        basedir="",
        sequence="box",
        gradslam_data_cfg=None,
        desired_image_height=h,
        desired_image_width=w,
        num_frames_total=max(num_frames, 60),
        start=0,
        end=-1,
        stride=1,
        num_frames=num_frames,
    ),
    gaussians=dict(
        gaussian_distribution="anisotropic",
        training_args=dict(
            xyz_lr=0.0001,
            feature_lr=0.0025,
            rgb_lr=0.0025,
            rotation_lr=0.001,
            opacity_lr=0.05,
            scaling_lr=0.001,
        ),
    ),
    cameras=dict(
        adam_betas=(0.7, 0.99),
        frontend_lr=dict(
            cam_rot_lr_init=rot_lr_base,
            cam_rot_lr_final=rot_lr_base / 5,
            cam_rot_lr_max_step=num_tracking_iter,
            cam_trans_lr_init=trans_lr_base,
            cam_trans_lr_final=trans_lr_base / 5,
            cam_trans_lr_max_step=num_tracking_iter,
            exposure_lr_init=0.005,
            exposure_lr_final=0.0001,
            exposure_lr_max_step=60,
        ),
        backend_lr=dict(
            cam_rot_lr_init=rot_lr_base / 4,
            cam_rot_lr_final=0.0,
            cam_rot_lr_max_step=2 * num_ba_iters,
            cam_trans_lr_init=trans_lr_base / 4,
            cam_trans_lr_final=0.0,
            cam_trans_lr_max_step=2 * num_ba_iters,
            exposure_lr_init=0.005,
            exposure_lr_final=0.0001,
            exposure_lr_max_step=60,
        ),
    ),
    tpu=dict(
        # backend BA mesh: "auto" shards covis mapping over every
        # attached device (parallel/ba.py) when more than one exists;
        # an int pins the device count; "off" forces single-device
        mesh_devices=os.environ.get("MESH_DEVICES", "auto"),
        # backend map on a SECOND device, overlapping the frontend's
        # (the reference's two-process / two-map-copy concurrency —
        # scripts/gaus_mp.py:97-114): "off" | "auto" (device 1 when >1
        # attached) | explicit index. Exclusive with a multi-device
        # BA mesh.
        backend_device=os.environ.get("BACKEND_DEVICE", "off"),
        # kernel elementwise compute dtype: "f32" (default) | "bf16"
        # (experiment knob — measured ~1.05x on the v5e VPU, PERF.md)
        compute_dtype=os.environ.get("COMPUTE_DTYPE", "f32"),
        pair_budget_factor=float(os.environ.get("PAIR_BUDGET", 1.75)),
        # the frontend's active count is bounded by tau_l while its
        # capacity floor covers tau_l*margin, so its pair budget can sit
        # much closer to the observed pair count (~2.05x active, ~419k at
        # the 340x600 steady state vs the 393216-capacity bucket);
        # escalation is the overflow backstop
        # resolution-aware default: at 680x1200 the frontend map fills
        # toward tau_l and the measured pair demand overflows the 1.35
        # budget mid-run (one demand-sized escalation re-trace, minutes
        # on this host) — start at the level the escalation would reach
        pair_budget_factor_frontend=float(
            os.environ.get("PAIR_BUDGET_FRONT",
                           1.35 if h * w <= 340 * 600 * 1.5 else 1.75)),
        max_tiles_per_gaussian=4,
        capacity_quantum=1 << 17,
        capacity_margin=1.2,
        # consecutive mapping iterations sharing one binning. Measured
        # A/B at 340x600/30 frames (PSNR): rebin=1 21.59, rebin=2 22.26,
        # rebin=4 20.38 — run noise is ~±0.9 dB, so 2 is quality-neutral
        # and ~10% faster; only 4 shows a clear staleness cost.
        mapping_rebin_every=int(os.environ.get("REBIN_EVERY", 2)),
        # coarse mapping: each fused mapping iteration renders a rotating
        # checkerboard of 1/stride^2 of the tiles (full coverage every
        # stride^2 iters); 1 = exact reference schedule. Multi-seed A/B
        # (3 seeds x 100 frames, PERF.md): stride 2 38.49+-0.40 dB /
        # ATE 0.0050, stride 3 38.60+-0.79 / 0.0057 vs default
        # 38.45+-1.02 / 0.0061 — both within the 0.3 dB budget (better
        # than default on the seed means); 3 shipped here.
        coarse_map_stride=int(os.environ.get("COARSE_MAP_STRIDE", 3)),
        # compact coarse tracking: phase-major pair cache whose head
        # block is the coarse checkerboard's pairs — coarse iterations
        # slice it, cutting per-pair preprocess + pose-grad reduction to
        # O(r_max/s^2)/iter. Same pairs per rendered tile; only f32
        # accumulation grouping moves (A/B row "ctrack0" reverts).
        compact_coarse_track=bool(
            int(os.environ.get("COMPACT_TRACK", 1))),
        # rotating-checkerboard schedule for the backend's fused 4-task
        # mapping batches. Applies to POST-prune tasks (+ first submap
        # + idle refinement) only — the all-coarse r3 row ("cmapb3")
        # was catastrophic via the merge-opacity-cap/prune coverage
        # race; the post-prune-only knob is gated by "cmapb3pp".
        # 1 = dense reference-exact batches.
        backend_coarse_map_stride=int(
            os.environ.get("BACKEND_COARSE_MAP_STRIDE", 1)),
        # optional coarse stride for the PRE-prune block too (donor
        # re-opacification coverage: stride 2 = 5 full covers per
        # 20-task block); gated by "cmapb2pre". 1 = dense.
        backend_coarse_pre_stride=int(
            os.environ.get("BACKEND_COARSE_PRE_STRIDE", 1)),
        # keyframe-coverage view fused into the tracking program (same
        # staleness assumption as tracking's pair cache); 0 = fresh
        # full-binned render_view per keyframe test (reference-exact)
        fused_kf_view=bool(int(os.environ.get("FUSED_KF_VIEW", 1))),
        # speculative next-frame tracking binning (value-identical to
        # the host pose init; pure dispatch-overlap — see Frontend)
        speculative_bin=bool(int(os.environ.get("SPEC_BIN", 1))),
        # pre-size the maps so the capacity bucket NEVER flips mid-run:
        # every flip re-traces + re-lowers every jitted program (seconds
        # to minutes on a slow host). Frontend is bounded by tau_l; the
        # backend floor covers the bench-scale global map.
        frontend_capacity=-(-int(h * w * 1.5 * 1.2) // (1 << 17)) * (1 << 17),
        # must cover the MERGE PEAK (steady global map + one full donor
        # submap, before prune compacts), or submap merges flip the
        # bucket and re-trace the backend program set mid-run (30-90 s
        # on this host). Sized from trajectory arithmetic:
        #   peak(frames) ~ min(donor0 + g * frames, saturation),
        # with measured anchors at the two bench shapes (round 5, on
        # the chip, at the SHIPPED defaults — coarse stride 3 + the
        # escalated pair factor densify ~25% more than the r4 anchors
        # did): 340x600 merge peak 511k at 34 frames (~9.4k/frame =
        # 0.046*h*w after a ~1.0*h*w first donor; the r4 anchor was
        # 561k@66f pre-stride-3); 680x1200 peak 2.35M by frame 23
        # (~1.42*h*w donor, ~42k/frame) saturating near 2.9-3.1*h*w as
        # scene coverage completes; donor0/g interpolate in h*w between
        # the anchors. A bucket flip triggers at n*capacity_margin >
        # floor, so the floor covers peak * 1.2 (margin) * 1.05
        # (headroom — peaks drift a few % run-to-run with the pair
        # budget). BACKEND_CAP_MULT (legacy env knob, used by the A/B
        # sweeps) overrides with a flat multiplier; growth PAST the
        # floor is the merge-horizon policy's job.
        backend_capacity=-(-int(
            h * w * float(os.environ["BACKEND_CAP_MULT"])
            if os.environ.get("BACKEND_CAP_MULT")
            else 1.26 * min(
                (1.00 + 0.45 * _res) * h * w
                + (0.046 + 0.006 * _res) * h * w * num_frames,
                3.1 * h * w)
        ) // (1 << 17)) * (1 << 17),
    ),
    viz=dict(viz_w=w, viz_h=h, view_scale=1, mesh_every=5,
             gen_animation=False, video_freq=30),
    eval=dict(save_renders=False, eval_mesh=False, save_mesh=False,
              mesh_interval=5, voxel_size=0.01),
)
