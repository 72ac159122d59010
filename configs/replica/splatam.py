"""SplaTAM-baseline experiment profile for Replica (parity with the
reference configs/replica/splatam.py — method='3dgs', isotropic
gaussians, its own densify / keyframe / lr settings). Driven by
scripts/splatam.py, the no-submap comparison baseline (reference
README.md:163-168).
"""
import os

scenes = ["room0", "room1", "room2",
          "office0", "office1", "office2", "office3", "office4"]

seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]

name = "Replica"
h = 340 * 2
w = 600 * 2
num_tracking_iter = 40

config = dict(
    vis_base_dir=f"output/splatam_{name}_seed{seed}/{scene_name}",
    seed=seed,
    use_wandb=False,
    wandb=dict(name=name, project_name="GauS_SLAM_TPU_Replica"),
    render=dict(
        method="3dgs",
        use_sa=True,
        use_weight_norm=False,
        enable_exposure=False,
        eps=1e-6,
        depth_far=1e2,
        depth_near=1e-2,
    ),
    frontend=dict(
        map_every=1,
        keyframe_every=5,
        num_tracking_iters=num_tracking_iter,
        num_mapping_iters=60,
        num_overlap_frames=24,
        additional_densify=False,
        # the shared SystemConfig surface still reads these:
        converged_th=-1,
        tau_k=0.01,
        tau_l=h * w * 1.5,
        max_frames=40,
        vel_pose_init=True,
        enable_retracking=False,
    ),
    # keys read by scripts/splatam.py:48-49 (keyframe selection policy)
    splatam=dict(
        keyframe_every=5,
        desc_threshold=0.8,
    ),
    backend=dict(
        num_ba_iters=60,
        num_frame_saved=10,
        num_covis_submaps=20,
        sleep_time=0.1,
        mesh_vis=False,
        render_vis=False,
        common_vis=False,
        gs_densify=False,
        random_process=False,
        final_refinement=-1,
    ),
    densify=dict(
        use_edge_growth=False,
        densify_interval=10,
        method="splatam",
        sil_thres=0.5,
        edge_thres=0.4,
        dep_thres=0.1,
        opacity_cuil=0.05,
        scale_cuil=5e-4,
        scale_max=0.1,
        num_addpts=4000000,
        percent_dense=0.01,
        densify_grad_threshold=0.0002,
        extent=2,
    ),
    loss=dict(
        ignore_outliners=True,
        use_normal_loss=False,
        silmask_th=0.99,
        tracking=dict(color=0.5, depth=1.0, normal=0, dist=0),
        mapping=dict(color=0.5, depth=1.0, normal=0, dist=0),
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
        gaussian_distribution="isotropic",
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
            cam_rot_lr_init=0.0004,
            cam_rot_lr_final=0.00004,
            cam_rot_lr_max_step=40,
            cam_trans_lr_init=0.002,
            cam_trans_lr_final=0.0002,
            cam_trans_lr_max_step=40,
            exposure_lr_init=0.001,
            exposure_lr_final=0.0001,
            exposure_lr_max_step=60,
        ),
        # scripts/splatam.py never runs the backend; SystemConfig still
        # parses this section (same values as the frontend schedule)
        backend_lr=dict(
            cam_rot_lr_init=0.0004,
            cam_rot_lr_final=0.00004,
            cam_rot_lr_max_step=40,
            cam_trans_lr_init=0.002,
            cam_trans_lr_final=0.0002,
            cam_trans_lr_max_step=40,
            exposure_lr_init=0.001,
            exposure_lr_final=0.0001,
            exposure_lr_max_step=60,
        ),
    ),
    tpu=dict(
        pair_budget_factor=2,
        max_tiles_per_gaussian=4,
        capacity_quantum=1 << 17,
    ),
    viz=dict(viz_w=600, viz_h=340, view_scale=2, mesh_every=5,
             gen_animation=False, video_freq=30),
    eval=dict(save_renders=False, eval_mesh=True, save_mesh=True,
              mesh_interval=5, voxel_size=0.01),
)
