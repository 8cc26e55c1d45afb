"""Record: GAC mono forward fps + DCN op timing on the TPU."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def timeit_multi(fn, argsets, iters=12):
    import jax
    jax.block_until_ready(fn(*argsets[0]))
    t0 = time.perf_counter()
    outs = [fn(*argsets[i % len(argsets)]) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1000

def main():
    import jax, jax.numpy as jnp, tempfile
    from visualdet3d_tpu.registry import DETECTOR_DICT
    import visualdet3d_tpu.models  # noqa
    from visualdet3d_tpu.testing import gac_detector_cfg, write_synthetic_priors
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating
    from visualdet3d_tpu.ops.deform_conv import modulated_deform_conv

    results = {}
    rng = np.random.default_rng(0)

    # DCN op at DLA-neck scale (stride-4 KITTI)
    b, h, w, cin, cout = 4, 96, 320, 64, 64
    sets = []
    for _ in range(4):
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
        off = jnp.asarray(0.5 * rng.standard_normal((b, h, w, 18)).astype(np.float32))
        m = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)).astype(np.float32))
        sets.append((x, off, m))
    wgt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.01)
    f = jax.jit(lambda x, o, m: modulated_deform_conv(x, o, m, wgt))
    results['dcn_fwd_ms'] = round(timeit_multi(f, sets), 2)
    g = jax.jit(lambda x, o, m: jax.grad(
        lambda xx, oo, mm: modulated_deform_conv(xx, oo, mm, wgt).sum())(x, o, m)[0].sum())
    results['dcn_fwd_bwd_ms'] = round(timeit_multi(g, sets), 2)

    # GAC mono forward (resnet101, 288x1280, bf16)
    pre = tempfile.mkdtemp()
    write_synthetic_priors(pre, ['Car'], num_ratios=2)
    cfg = gac_detector_cfg(pre)
    cfg.inference_dtype = 'bfloat16'
    system = DETECTOR_DICT[cfg.name](cfg)
    image_hw = (288, 1280)
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)
    variables = jax.device_put(cast_floating(variables, 'bfloat16'))
    system.anchor_pack(image_hw)
    batch = 16
    P2 = jnp.asarray(np.tile(np.array([[721.5,0,609.6,44.8],[0,721.5,72.8,0.2],[0,0,1,0.003]],np.float32),(batch,1,1)))
    fwd = jax.jit(lambda v, im, p: system.predict(v, im, p, max_detections=32)['scores'])
    argsets = [(variables, jnp.asarray(rng.standard_normal((batch,*image_hw,3)).astype(np.float32)), P2)
               for _ in range(4)]
    ms = timeit_multi(fwd, argsets, iters=12)
    results['gac_mono_fps_b16'] = round(batch / ms * 1000, 1)
    results['gac_mono_ms_b16'] = round(ms, 2)
    print(json.dumps(results))

if __name__ == '__main__':
    main()
