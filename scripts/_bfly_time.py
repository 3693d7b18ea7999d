import sys

sys.path.insert(0, ".")
import scripts.profile_voting as pv  # noqa: E402
import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from dvs_mcemvs_tpu.ops import camera as camops, trajectory as trajmod, voting  # noqa: E402
from dvs_mcemvs_tpu.ops import voting_hist as vh  # noqa: E402
from dvs_mcemvs_tpu.ops.se3 import SE3  # noqa: E402

seg = int(sys.argv[1])
pb = int(sys.argv[2]) if len(sys.argv) > 2 else 8
g = int(sys.argv[3]) if len(sys.argv) > 3 else 16

mapper, (x, y, t), traj, T_rv_w = bench.build_workload()
dev = (jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
       jnp.asarray(t, jnp.float32))
z0 = float(mapper.depth_vec.depths()[0])
vp = (float(mapper.vcam.fx), float(mapper.vcam.fy),
      float(mapper.vcam.cx), float(mapper.vcam.cy))
K_cam = jnp.asarray(mapper.cam.P, jnp.float32)
Kv_inv = jnp.asarray(np.linalg.inv(mapper.vcam.P), jnp.float32)
depths = jnp.asarray(mapper.depth_vec.depths(), jnp.float32)
rect_params = camops.rect_static(mapper.cam)


@jax.jit
def warp(x, y, t):
    trj = trajmod.Trajectory(traj.ts, SE3(traj.poses.q, traj.poses.t))
    return voting.warp_events_to_z0(
        x, y, t, trj, SE3(T_rv_w.q, T_rv_w.t), None, K_cam, Kv_inv,
        z0=z0, width=mapper.width, packet_size=1024, full=True,
        rect_params=rect_params)


packets = warp(*dev)
mm = "butterfly" if len(sys.argv) > 4 and sys.argv[4] == "bf" else "flat"
kw = dict(group_size=g, segments=seg, engine="pallas", plane_block=pb, merge_mode=mm)
fn = jax.jit(lambda pk: vh.splat_hist(pk, depths, z0, vp, 640, 480, **kw))
print(f"splat g{g} seg{seg} pb{pb} {mm}: {pv.timeit(fn, packets)*1e3:.2f} ms",
      flush=True)
