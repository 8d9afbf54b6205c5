"""Subprocess worker for the REAL 2-process multi-host integration test
(tests/test_multihost.py::test_two_process_training_matches_single_process).

Each invocation is one training process of an N-process CPU cluster: it
forces (global_devices // N) host devices, joins the jax.distributed coordinator via
``parallel.mesh.init_distributed`` (the production entry point — gloo
collectives on CPU), trains a tiny L2-only Coach for 2 steps on its slice
of the global batch, and dumps per-step losses + a final-parameter blob for
the parent test to compare across topologies.

Run: python tests/multihost_worker.py <config.json>
The config carries: process_id, num_processes, port, data_root, val_root,
exp_root, out_npz, skew_s.
"""

import json
import os
import sys
import time


def main() -> None:
    cfg_path = sys.argv[1]
    with open(cfg_path) as f:
        wcfg = json.load(f)
    pid = int(wcfg["process_id"])
    nproc = int(wcfg["num_processes"])
    n_global = int(wcfg.get("global_devices", 8))
    n_local = n_global // nproc

    # backend setup must precede any device query; the environment's
    # sitecustomize imports jax and pins the tunneled TPU platform, so (as in
    # tests/conftest.py) the platform is forced via config, not env vars.
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", wcfg["cache_dir"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if float(wcfg.get("skew_s", 0)) and pid != 0:
        # deliberate startup skew: the slower process must still join (the
        # coordinator waits) and the faster one must block in its first
        # collective until this one catches up
        time.sleep(float(wcfg["skew_s"]))

    from instantrestore_tpu.parallel.mesh import init_distributed

    if nproc > 1:
        init_distributed(
            f"localhost:{wcfg['port']}", num_processes=nproc, process_id=pid
        )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == n_global, jax.device_count()
    assert jax.local_device_count() == n_local, jax.local_device_count()

    import numpy as np

    from instantrestore_tpu.configs.config import TrainConfig
    from instantrestore_tpu.models.restorer import init_restorer_params
    from instantrestore_tpu.models.unet import UNetConfig
    from instantrestore_tpu.models.vae import VAEConfig
    from instantrestore_tpu.models.restorer import RestorerStatics
    from instantrestore_tpu.training.coach import Coach
    import jax.numpy as jnp

    statics = RestorerStatics(
        unet_cfg=UNetConfig(
            sample_size=8,
            block_out_channels=(32, 64, 64, 64),
            attention_heads=(1, 2, 2, 2),
            cross_attention_dim=16,
            norm_num_groups=8,
        ),
        vae_cfg=VAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4),
        use_adain=True,
        compute_dtype=jnp.float32,
    )

    cfg = TrainConfig()
    cfg.compute.batch_size = n_global  # global; each process feeds 1/nproc
    # __post_init__ froze test_batch_size from the DEFAULT batch_size (3),
    # which does not divide over 2 processes — pin it to the global batch
    cfg.compute.test_batch_size = n_global
    cfg.compute.workers = 0
    cfg.data.data_root = wcfg["data_root"]
    cfg.data.val_data_root = wcfg["val_root"]  # empty dir -> validate() no-op
    cfg.data.dataset_type = "face_restore"
    cfg.data.resolution = 64
    cfg.log.exp_root = wcfg["exp_root"]
    cfg.log.exp_name = "mh2p"
    cfg.log.log2wandb = False
    cfg.steps.max_steps = 2
    cfg.steps.metric_interval = 1
    cfg.steps.image_interval = 1000
    cfg.steps.val_interval = 1000
    cfg.steps.save_interval = 1000
    cfg.optim.lambda_lpips = 0.0
    cfg.optim.lambda_ssim = 0.0
    cfg.optim.lambda_gan = 0.0
    cfg.model.lora_rank_unet = 4
    cfg.model.lora_rank_vae = 4

    params = init_restorer_params(
        jax.random.PRNGKey(0), statics, lora_rank_unet=4, lora_rank_vae=4
    )
    params["caption_enc"] = jax.random.normal(jax.random.PRNGKey(9), (1, 7, 16))

    coach = Coach(cfg, statics=statics, params=params)
    assert coach.process_count == nproc
    assert coach.device_count == n_global

    records = []
    orig_log = coach.logger.log_metrics

    def capture(metrics, prefix="train"):
        records.append(
            {k: float(v) for k, v in metrics.items() if k != "steps_per_sec"}
        )
        return orig_log(metrics, prefix)

    coach.logger.log_metrics = capture
    coach.train()
    assert coach.train_step_num == 2

    # replicated params are fully addressable on every process
    leaves, _ = jax.tree_util.tree_flatten_with_path(coach.params)
    flat = {
        jax.tree_util.keystr(kp): np.asarray(jax.device_get(v))
        for kp, v in leaves
    }
    np.savez(wcfg["out_npz"], **flat)
    with open(wcfg["out_npz"] + ".json", "w") as f:
        json.dump(
            {
                "process_index": pid,
                "losses": records,
                "global_devices": jax.device_count(),
                "local_devices": jax.local_device_count(),
            },
            f,
        )
    print(f"worker {pid}/{nproc}: OK", flush=True)


if __name__ == "__main__":
    main()
