"""Replica experiment profile (parity with the reference
configs/replica/config.py — same sections, knobs, and values; ablation
switches A-H via the EXP env var, scene via SCENE_NUM, seed via SEED).
"""
import os

scenes = ["room0", "room1", "room2",
          "office0", "office1", "office2", "office3", "office4"]

seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]
exp = int(os.environ.get("EXP", 0))

# ablation switches (README.md:163-168 of the reference)
wo_unbiased_depth = exp == 1     # A: 3dgs rasterization path
wo_sa = exp == 2                 # B: no surface-aware depth
wo_weight_norm = exp == 3        # C
wo_reg_loss = exp == 4           # D
wo_keyframe = exp == 5           # E
wo_localmap = exp == 6           # F
wo_random_optimization = exp == 7  # G
wo_final_refinement = exp == 8   # H

name = "Replica"
h = 340 * 2
w = 600 * 2
trans_lr_base = 0.002
rot_lr_base = 0.0004
num_tracking_iter = 40
num_ba_iters = 60
localmap_max_frames = 40

config = dict(
    vis_base_dir=f"output/{name}_exp{exp}_seed{seed}/{scene_name}",
    seed=seed,
    use_wandb=False,
    wandb=dict(name=name, project_name="GauS_SLAM_TPU_Replica"),
    render=dict(
        method="2dgs" if not wo_unbiased_depth else "3dgs",
        use_sa=not wo_sa,
        use_weight_norm=not wo_weight_norm,
        enable_exposure=False,
        eps=1e-6,
        depth_far=1e2,
        depth_near=1e-2,
    ),
    frontend=dict(
        num_tracking_iters=num_tracking_iter,
        # coarse-to-fine tracking: early iterations render a stride-2
        # tile checkerboard from the same pair cache (quality-free on
        # the synthetic A/B — best ATE of all variants; PERF.md)
        coarse_iters=int(num_tracking_iter * 0.6),
        coarse_stride=2,
        num_mapping_iters=localmap_max_frames,
        converged_th=-1,
        tau_k=0.01 if not wo_keyframe else -1,
        tau_l=h * w * 1.5,
        max_frames=localmap_max_frames,
        vel_pose_init=True,
        enable_retracking=False,
        additional_densify=False,
    ),
    backend=dict(
        num_ba_iters=num_ba_iters,
        num_frame_saved=localmap_max_frames // 4,
        num_covis_submaps=20,
        sleep_time=0.1,
        mesh_vis=False,
        render_vis=False,
        common_vis=True,
        gs_densify=False,
        random_process=not wo_random_optimization,
        final_refinement=-1 if not wo_final_refinement else 0,
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
        densify_grad_threshold=0.0002,
        extent=2,
    ),
    loss=dict(
        ignore_outliners=False,
        use_normal_loss=False,
        silmask_th=0.90,
        tracking=dict(color=0.5, depth=1.0, normal=0),
        mapping=dict(color=0.5, depth=1.0, normal=0,
                     dist=0.1 if not wo_reg_loss else 0),
    ),
    data=dict(
        dataset_name="replica",
        meshdir="./data/Replica/cull_replica_mesh",
        basedir="./data/Replica",
        gradslam_data_cfg="./configs/data/replica.yaml",
        sequence=scene_name,
        desired_image_height=h,
        desired_image_width=w,
        start=0,
        end=-1,
        stride=1,
        num_frames=-1,
    ),
    gaussians=dict(
        gaussian_distribution="anisotropic" if not wo_unbiased_depth
        else "isotropic",
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
            cam_rot_lr_final=rot_lr_base / 10,
            cam_rot_lr_max_step=num_tracking_iter,
            cam_trans_lr_init=trans_lr_base,
            cam_trans_lr_final=trans_lr_base / 10,
            cam_trans_lr_max_step=num_tracking_iter,
            exposure_lr_init=0.0001,
            exposure_lr_final=0.00001,
            exposure_lr_max_step=100,
        ),
        backend_lr=dict(
            cam_rot_lr_init=rot_lr_base / 4,
            cam_rot_lr_final=rot_lr_base / 10,
            cam_rot_lr_max_step=2 * num_ba_iters,
            cam_trans_lr_init=trans_lr_base / 4,
            cam_trans_lr_final=trans_lr_base / 10,
            cam_trans_lr_max_step=2 * num_ba_iters,
            exposure_lr_init=0.0001,
            exposure_lr_final=0.00001,
            exposure_lr_max_step=100,
        ),
    ),
    tpu=dict(
        pair_budget_factor=2,
        max_tiles_per_gaussian=4,
        capacity_quantum=1 << 17,
        # mapping bin-reuse (2 consecutive iterations share one binning)
        # and coarse mapping (each fused mapping iteration renders a
        # rotating stride-2 checkerboard — 1/4 of the tiles, full
        # coverage every 4 iterations; the per-pixel masked-mean loss
        # makes the subset an unbiased stochastic gradient). Both
        # validated quality-neutral in the multi-seed A/B (3 seeds x
        # 100 frames, PERF.md): rebin2 38.45 vs rebin1 38.44 dB; cmap2
        # 38.49+-0.40 / ATE 0.0050 vs default 38.45+-1.02 / 0.0061.
        # Stride 2 here (the synthetic bench profile ships 3, also
        # validated); set 1 for the exact reference schedule.
        mapping_rebin_every=2,
        coarse_map_stride=2,
        # backend map on a second device when more than one is attached
        # ("off" | "auto" | index) — the reference's two-process
        # concurrency (scripts/gaus_mp.py:97-114, two full map copies)
        backend_device=os.environ.get("BACKEND_DEVICE", "off"),
    ),
    viz=dict(viz_w=600, viz_h=340, view_scale=2, mesh_every=5,
             gen_animation=False, video_freq=30,
             # reference viewer camera pose (configs/replica/config.py:
             # 167-171) — consumed only by the live Open3D viewers,
             # which are display-bound (see backend mesh_vis warning);
             # carried for config-surface parity
             cam_loc=([[1.0, -0.0, 0.0, -3.08],
                       [-0.0, -1.0, -0.0, 1.14],
                       [0.0, -0.0, -1.0, 5.83],
                       [0.0, 0.0, 0.0, 1.0]])),
    eval=dict(save_renders=False, eval_mesh=False, save_mesh=False,
              mesh_interval=5, voxel_size=0.01),
)
