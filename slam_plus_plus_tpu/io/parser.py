"""g2o-dialect dataset parser with the full SLAM++ token registry.

Reference analogue: CParserTemplate + the per-token parse primitives
(reference include/slam/Parser.h:1138, include/slam_app/ParsePrimitives.h —
token registry enumerated in SURVEY §2.4) and the TDatasetPeeker pre-parse
probe (reference include/slam_app/Main.h:852).

Behavioral details replicated:
  * 2D/3D information matrices arrive as upper-triangular listings and are
    symmetrized (data/Readme.txt: "information matrix ... upper-triangular");
  * EDGE3/EDGE_SE3 default dialect gives the rotation as RPY; the
    ``:AXISANGLE`` suffix switches to axis-angle (ParsePrimitives.h EDGE3);
  * VERTEX_CAM world poses are inverted into the internal world->camera
    representation and the distortion is scaled by the mean focal length
    (ParsePrimitives.h:861-927);
  * XY-parsed 2D landmark edges are converted to range-bearing with identity
    information (SE2_Types.h:602-615);
  * CONSISTENCY_MARKER lines trigger the incremental callback
    (include/slam_app/IncBAParsePrimitives.h:46).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional

import numpy as np

from slam_plus_plus_tpu.graph.system import GraphSystem
from slam_plus_plus_tpu.models import se2_types  # noqa: F401  (registers types)


def _sym_from_upper(values: List[float], n: int) -> np.ndarray:
    """Upper-triangular row-major listing -> symmetric matrix."""
    m = np.zeros((n, n))
    k = 0
    for i in range(n):
        for j in range(i, n):
            m[i, j] = values[k]
            m[j, i] = values[k]
            k += 1
    return m


def _rpy_to_axis_angle(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """Euler RPY -> axis-angle (reference 3DSolverBase quaternion route)."""
    cr, sr = math.cos(roll * 0.5), math.sin(roll * 0.5)
    cp, sp = math.cos(pitch * 0.5), math.sin(pitch * 0.5)
    cy, sy = math.cos(yaw * 0.5), math.sin(yaw * 0.5)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return _quat_to_axis_angle(w, x, y, z)


def _quat_to_axis_angle(w, x, y, z) -> np.ndarray:
    n = math.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    if w < 0:
        w, x, y, z = -w, -x, -y, -z
    vn = math.sqrt(x * x + y * y + z * z)
    angle = 2.0 * math.atan2(vn, w)
    if vn < 1e-12:
        return np.zeros(3)
    return np.array([x, y, z]) * (angle / vn)


def _axis_angle_to_quat_np(aa: np.ndarray):
    angle = float(np.linalg.norm(aa))
    if angle < 1e-12:
        return 1.0, 0.0, 0.0, 0.0
    s = math.sin(angle * 0.5) / angle
    w = math.cos(angle * 0.5)
    q = (w, aa[0] * s, aa[1] * s, aa[2] * s)
    if w < 0:
        q = tuple(-v for v in q)
    return q


def _invert_cam_pose(pos: np.ndarray, qx, qy, qz, qw) -> np.ndarray:
    """g2o VERTEX_CAM world pose -> internal world->camera [t, axis-angle]."""
    n = math.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    # inverse (conjugate)
    qw, qx, qy, qz = qw, -qx, -qy, -qz
    # t = q^-1 * (-pos)
    px, py, pz = -pos
    # quaternion rotation of vector
    uvx = qy * pz - qz * py
    uvy = qz * px - qx * pz
    uvz = qx * py - qy * px
    uuvx = qy * uvz - qz * uvy
    uuvy = qz * uvx - qx * uvz
    uuvz = qx * uvy - qy * uvx
    t = np.array([px + 2 * (qw * uvx + uuvx),
                  py + 2 * (qw * uvy + uuvy),
                  pz + 2 * (qw * uvz + uuvz)])
    aa = _quat_to_axis_angle(qw, qx, qy, qz)
    return np.concatenate([t, aa])


class ParseStats:
    def __init__(self):
        self.lines = 0
        self.vertices = 0
        self.edges = 0
        self.markers = 0
        self.unknown_tokens: Dict[str, int] = {}


def peek_dataset(path: str, max_lines: int = 5000) -> Dict[str, bool]:
    """Pre-parse probe deciding the problem family (reference TDatasetPeeker).

    Returns flags: has_se2, has_se3, has_landmark2d, has_landmark3d, has_ba,
    has_intrinsics, has_stereo, has_spheron, has_rocv, has_sim3.
    """
    flags = dict(has_se2=False, has_se3=False, has_landmark2d=False,
                 has_landmark3d=False, has_ba=False, has_intrinsics=False,
                 has_stereo=False, has_spheron=False, has_rocv=False,
                 has_sim3=False)
    with open(path) as f:
        for i, line in enumerate(f):
            if i >= max_lines:
                break
            tok = line.split(maxsplit=1)[0].upper() if line.strip() else ""
            if tok in ("EDGE2", "EDGE_SE2", "EDGE", "ODOMETRY", "VERTEX2", "VERTEX_SE2"):
                flags["has_se2"] = True
            elif tok in ("LANDMARK2:XY", "EDGE_SE2_XY", "LANDMARK",
                         "EDGE_BEARING_SE2_XY", "LANDMARK2:RB",
                         "EDGE_SE2_RB", "EDGE_BEARING_SE2_RB"):
                flags["has_landmark2d"] = True
            elif tok in ("EDGE3", "EDGE_SE3", "EDGE3:AXISANGLE", "EDGE_SE3:AXISANGLE", "VERTEX3", "VERTEX_SE3"):
                flags["has_se3"] = True
            elif tok in ("LANDMARK3:XYZ", "EDGE_SE3_XYZ"):
                flags["has_landmark3d"] = True
            elif tok in ("EDGE_PROJECT_P2MC", "EDGE_P2MC", "EDGE_P2C", "VERTEX_CAM"):
                flags["has_ba"] = True
            elif tok in ("EDGE_PROJECT_P2MCI", "EDGE_P2CI", "EDGE_P2MCI",
                         "VERTEX_INTRINSICS"):
                flags["has_ba"] = True
                flags["has_intrinsics"] = True
            elif tok in ("EDGE_PROJECT_P2SC", "EDGE_P2SC", "VERTEX_SCAM"):
                flags["has_stereo"] = True
            elif tok in ("VERTEX_SPHERON:QUAT", "EDGE_SPHERON_XYZ"):
                flags["has_spheron"] = True
            elif tok.startswith("ROCV"):
                flags["has_rocv"] = True
            elif tok in ("VERTEX_CAM:SIM3", "VERTEX:SIM3"):
                flags["has_sim3"] = True
    return flags


#: SE(2)/SE(3) problem families ignore VERTEX initialization lines and
#: initialize vertices from edges instead — the reference's app wires
#: CIgnoreAllVertexTraits for them (reference src/slam_app/Solve2DImpl.cpp:50,
#: Solve3DPoseOnlyImpl.cpp:52); BA families use their VERTEX_* lines
#: (CBAVertexTraits, src/slam_app/SolveBAImpl.cpp:56).
IGNORED_VERTEX_TOKENS = frozenset(
    ["VERTEX2", "VERTEX", "VERTEX_SE2", "VERTEX3", "VERTEX_SE3", "VERTEX_XYZ"])


def parse_g2o(path: str, system: Optional[GraphSystem] = None,
              on_edge: Optional[Callable] = None,
              on_marker: Optional[Callable] = None,
              use_vertex_init: bool = False) -> GraphSystem:
    """Parse a dataset into a GraphSystem.

    on_edge(system) is invoked after each edge insertion (the incremental
    hook — reference CParseLoop::AppendSystem -> solver.Incremental_Step);
    on_marker(system) on each CONSISTENCY_MARKER.

    use_vertex_init=True honors SE(2)/SE(3) VERTEX lines instead of the
    reference CLI's default of initializing those vertices from edges.
    VERTEX_XYZ is special: ignored in pose-landmark problems, but honored
    whenever the dataset peeks as BA (it then belongs to camera edges).
    """
    if system is None:
        system = GraphSystem()
    stats = ParseStats()
    if use_vertex_init:
        is_ba = True
    else:
        _peek = peek_dataset(path)
        is_ba = _peek["has_ba"] or _peek["has_stereo"] or _peek["has_spheron"]

    import sys as _sys

    with open(path) as f:
        for line in f:
            stats.lines += 1
            line = line.strip()
            if not line or line.startswith(("#", "%", "//")):
                continue
            parts = line.split()
            tok = parts[0].upper()
            vals = parts[1:]
            try:
                _dispatch_line(tok, vals, system, stats, on_edge, on_marker,
                               use_vertex_init, is_ba)
            except (IndexError, ValueError):
                # reference: "error: line N: line is truncated" + continue
                # (e.g. reference include/slam_app/ParsePrimitives.h:594-597)
                print(f"error: line {stats.lines}: line is truncated",
                      file=_sys.stderr)
    system.parse_stats = stats
    return system


def _dispatch_line(tok, vals, system, stats, on_edge, on_marker,
                   use_vertex_init, is_ba):
    # single-pass loop so the token branches below can use `continue` to
    # skip (they are shared with the original inline-parser indentation)
    for _once in (0,):
        if True:

            if tok in ("VERTEX2", "VERTEX_SE2", "VERTEX"):
                stats.vertices += 1
                if not use_vertex_init:
                    continue  # reference CLI: CIgnoreAllVertexTraits
                vid = int(vals[0])
                system.add_vertex(vid, "pose2d", np.array([float(v) for v in vals[1:4]]))
            elif tok in ("EDGE2", "EDGE_SE2", "EDGE", "ODOMETRY"):
                i, j = int(vals[0]), int(vals[1])
                z = np.array([float(v) for v in vals[2:5]])
                info = _sym_from_upper([float(v) for v in vals[5:11]], 3)
                system.add_edge("edge_pose2d", (i, j), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok in ("LANDMARK2:XY", "EDGE_SE2_XY", "LANDMARK",
                         "EDGE_BEARING_SE2_XY"):
                i, j = int(vals[0]), int(vals[1])
                xy = np.array([float(vals[2]), float(vals[3])])
                z, info = se2_types.xy_measurement_to_polar(xy)
                system.add_edge("edge_pose_landmark2d", (i, j), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok in ("LANDMARK2:RB", "EDGE_SE2_RB",
                         "EDGE_BEARING_SE2_RB"):
                i, j = int(vals[0]), int(vals[1])
                z = np.array([float(vals[2]), float(vals[3])])
                info = _sym_from_upper([float(v) for v in vals[4:7]], 2)
                system.add_edge("edge_pose_landmark2d", (i, j), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok in ("VERTEX3", "VERTEX_SE3"):
                stats.vertices += 1
                if not use_vertex_init:
                    continue  # reference CLI: CIgnoreAllVertexTraits
                # rotation is RPY in the file; the reference converts to
                # axis-angle at parse time (CVertex3DParsePrimitive,
                # reference include/slam_app/ParsePrimitives.h:782-799)
                vid = int(vals[0])
                t = np.array([float(v) for v in vals[1:4]])
                aa = _rpy_to_axis_angle(float(vals[4]), float(vals[5]),
                                        float(vals[6]))
                system.add_vertex(vid, "pose3d", np.concatenate([t, aa]))
            elif tok in ("EDGE3", "EDGE_SE3"):
                # default dialect: relative pose with RPY rotation
                i, j = int(vals[0]), int(vals[1])
                t = [float(v) for v in vals[2:5]]
                aa = _rpy_to_axis_angle(float(vals[5]), float(vals[6]), float(vals[7]))
                z = np.concatenate([np.array(t), aa])
                info = _sym_from_upper([float(v) for v in vals[8:29]], 6)
                system.add_edge("edge_pose3d", (i, j), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok in ("EDGE3:AXISANGLE", "EDGE_SE3:AXISANGLE"):
                i, j = int(vals[0]), int(vals[1])
                z = np.array([float(v) for v in vals[2:8]])
                info = _sym_from_upper([float(v) for v in vals[8:29]], 6)
                system.add_edge("edge_pose3d", (i, j), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok in ("EDGE3:TERNARY", "EDGE_SE3_TERNARY"):
                # three-pose hyperedge (reference CEdgePose3D_Ternary,
                # SE3_Types.h:339): <i> <j> <k> <t xyz> <axis-angle>
                # <info 6x6 upper>; z measures the increment between the
                # relative motions i->j and j->k
                i, j, k = int(vals[0]), int(vals[1]), int(vals[2])
                z = np.array([float(v) for v in vals[3:9]])
                info = _sym_from_upper([float(v) for v in vals[9:30]], 6)
                system.add_edge("edge_pose3d_ternary", (i, j, k), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok == "VERTEX_XYZ":
                stats.vertices += 1
                if not is_ba:
                    continue  # SE3-landmark problems ignore VERTEX_XYZ too
                vid = int(vals[0])
                system.add_vertex(vid, "xyz", np.array([float(v) for v in vals[1:4]]))
            elif tok in ("LANDMARK3:XYZ", "EDGE_SE3_XYZ"):
                i, j = int(vals[0]), int(vals[1])
                z = np.array([float(v) for v in vals[2:5]])
                info = _sym_from_upper([float(v) for v in vals[5:11]], 3)
                system.add_edge("edge_pose_landmark3d", (i, j), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok == "VERTEX_CAM":
                vid = int(vals[0])
                pos = np.array([float(v) for v in vals[1:4]])
                qx, qy, qz, qw = (float(vals[4]), float(vals[5]),
                                  float(vals[6]), float(vals[7]))
                fx, fy, cx, cy, d = (float(vals[8]), float(vals[9]),
                                     float(vals[10]), float(vals[11]), float(vals[12]))
                pose = _invert_cam_pose(pos, qx, qy, qz, qw)
                d_scaled = d * 0.5 * (fx + fy)
                state = np.concatenate([pose, [fx, fy, cx, cy, d_scaled]])
                system.add_vertex(vid, "cam", state)
                stats.vertices += 1
            elif tok == "VERTEX_SCAM":
                vid = int(vals[0])
                pos = np.array([float(v) for v in vals[1:4]])
                qx, qy, qz, qw = (float(vals[4]), float(vals[5]),
                                  float(vals[6]), float(vals[7]))
                fx, fy, cx, cy, d, b = (float(vals[8]), float(vals[9]),
                                        float(vals[10]), float(vals[11]),
                                        float(vals[12]), float(vals[13]))
                pose = _invert_cam_pose(pos, qx, qy, qz, qw)
                # d is scaled by the mean focal like the mono path
                state = np.concatenate([pose,
                                        [fx, fy, cx, cy, d * 0.5 * (fx + fy), b]])
                system.add_vertex(vid, "scam", state)
                stats.vertices += 1
            elif tok == "VERTEX_INTRINSICS":
                vid = int(vals[0])
                fx, fy, cx, cy, d = (float(vals[1]), float(vals[2]),
                                     float(vals[3]), float(vals[4]), float(vals[5]))
                d_scaled = d * 0.5 * (fx + fy)
                system.add_vertex(vid, "intrinsics",
                                  np.array([fx, fy, cx, cy, d_scaled]))
                stats.vertices += 1
            elif tok == "VERTEX_SPHERON:QUAT":
                vid = int(vals[0])
                pos = np.array([float(v) for v in vals[1:4]])
                qx, qy, qz, qw = (float(vals[4]), float(vals[5]),
                                  float(vals[6]), float(vals[7]))
                pose = _invert_cam_pose(pos, qx, qy, qz, qw)
                system.add_vertex(vid, "spheron", pose)
                stats.vertices += 1
            elif tok in ("EDGE_PROJECT_P2MC", "EDGE_P2C", "EDGE_P2MC"):
                # <pt-id> <cam-id> <ox> <oy> <info 2x2 upper>
                pt, cam = int(vals[0]), int(vals[1])
                z = np.array([float(vals[2]), float(vals[3])])
                info = _sym_from_upper([float(v) for v in vals[4:7]], 2)
                system.add_edge("edge_p2c", (cam, pt), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok in ("EDGE_PROJECT_P2MCI", "EDGE_P2CI", "EDGE_P2MCI"):
                pt, cam, intr = int(vals[0]), int(vals[1]), int(vals[2])
                z = np.array([float(vals[3]), float(vals[4])])
                info = _sym_from_upper([float(v) for v in vals[5:8]], 2)
                system.add_edge("edge_p2ci", (cam, pt, intr), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok in ("EDGE_PROJECT_P2SC", "EDGE_P2SC"):
                pt, cam = int(vals[0]), int(vals[1])
                z = np.array([float(vals[2]), float(vals[3]), float(vals[4])])
                info = _sym_from_upper([float(v) for v in vals[5:11]], 3)
                system.add_edge("edge_p2sc", (cam, pt), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok == "EDGE_SPHERON_XYZ":
                pt, cam = int(vals[0]), int(vals[1])
                z = np.array([float(vals[2]), float(vals[3]), float(vals[4])])
                info = _sym_from_upper([float(v) for v in vals[5:11]], 3)
                system.add_edge("edge_spheron_xyz", (cam, pt), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok == "ROCV:TRANSMITTER":
                # landmark (transmitter) position; reference parses 6 values
                # (TVertex3D) but the landmark holds the first 3
                stats.vertices += 1
                vid = int(vals[0])
                system.add_vertex(vid, "landmark3d",
                                  np.array([float(v) for v in vals[1:4]]))
            elif tok == "ROCV:TRANSMITTER_UF":
                # unary anchor on the transmitter: the parsed factor IS the
                # information ("elements are not square roots"), the edge has
                # zero error/chi2 (reference CEdgeLandmark3DPrior,
                # include/slam/ROCV_Types.h:251,280-312)
                vid = int(vals[0])
                F = _sym_from_upper([float(v) for v in vals[1:7]], 3)
                system.add_edge("edge_landmark3d_prior", (vid,),
                                np.zeros(3), F)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok in ("ROCV:RECEIVER", "ROCV:RECEIVER_GTFAKE"):
                stats.vertices += 1
                vid = int(vals[0])
                system.add_vertex(vid, "pos_vel3d",
                                  np.array([float(v) for v in vals[1:7]]))
            elif tok == "ROCV:DELTA_TIME":
                i, j = int(vals[0]), int(vals[1])
                dt = np.array([float(vals[2])])
                info = _sym_from_upper([float(v) for v in vals[3:24]], 6)
                system.add_edge("edge_rocv_const_vel", (i, j), dt, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok == "ROCV:RANGE":
                i, j = int(vals[0]), int(vals[1])
                z = np.array([float(vals[2])])
                info = np.array([[float(vals[3])]])
                system.add_edge("edge_rocv_range", (i, j), z, info)
                stats.edges += 1
                if on_edge:
                    on_edge(system)
            elif tok == "CONSISTENCY_MARKER":
                stats.markers += 1
                if on_marker:
                    on_marker(system)
            elif tok in ("EQUIV", "PHASE"):
                pass  # bookkeeping tokens, ignored like the reference's CIgnore list
            else:
                stats.unknown_tokens[tok] = stats.unknown_tokens.get(tok, 0) + 1
