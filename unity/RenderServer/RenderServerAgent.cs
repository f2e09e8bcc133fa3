// Render-server agent for argus_tpu data generation.
//
// First-party implementation of the wire contract in docs/unity_contract.md
// (reference behavior: pculbertson/argus LeapProject/Assets/AgentCallback.cs):
// one 50-float continuous action = one episode; the agent applies all scene
// state (two camera poses + background colors, cube pose, light pose, 16 hand
// joint targets), renders once, and returns one visual observation per camera.
//
// Drop this into a Unity project with ML-Agents (release 21) and a
// URDF-imported LEAP hand; see unity/README.md for scene wiring.

using System.Collections.Generic;
using Unity.MLAgents;
using Unity.MLAgents.Actuators;
using Unity.MLAgents.Sensors;
using UnityEngine;

public class RenderServerAgent : Agent
{
    // docs/unity_contract.md action layout (argus_tpu/datagen.py slices)
    const int Cam1Pose = 0, Cam1Rgb = 7, Cam2Pose = 10, Cam2Rgb = 17;
    const int CubePose = 20, LightPose = 27, HandJoints = 34, ActionSize = 50;
    const int NumHandJoints = 16;

    [SerializeField] Camera camera1;
    [SerializeField] Camera camera2;
    [SerializeField] Rigidbody cubeBody;
    [SerializeField] Light sceneLight;
    ArticulationBody handRoot;

    // Action-vector joint order is the MJPC q_leap order; Unity articulation
    // indices are resolved by joint NAME so URDF import order doesn't matter.
    // (Behavioral contract with the MJCF hand model, mujoco/leap.)
    static readonly string[] MjpcJointNames =
    {
        "mcp_joint", "pip", "dip", "fingertip",
        "mcp_joint_2", "pip_2", "dip_2", "fingertip_2",
        "mcp_joint_3", "pip_3", "dip_3", "fingertip_3",
        "pip_4", "thumb_pip", "thumb_dip", "thumb_fingertip",
    };

    // mjpc action slot -> start index in the articulation's reduced-coordinate
    // (dof) list. Computed from cumulative dofCount in body-index order, NOT
    // from ArticulationBody.index itself: fixed links (mounts, tip pads)
    // consume a body index but contribute zero dofs.
    readonly Dictionary<int, int> jointDofStart = new Dictionary<int, int>();

    public override void Initialize()
    {
        if (camera1 == null || camera2 == null)
        {
            var cams = GetComponentsInChildren<Camera>();
            camera1 = camera1 != null ? camera1 : cams[0];
            camera2 = camera2 != null ? camera2 : cams[1];
        }
        if (cubeBody == null) cubeBody = GetComponentInChildren<Rigidbody>();
        if (sceneLight == null) sceneLight = GetComponentInChildren<Light>();
        handRoot = GetComponentInChildren<ArticulationBody>();

        camera1.clearFlags = CameraClearFlags.SolidColor;
        camera2.clearFlags = CameraClearFlags.SolidColor;

        // Build name -> dof-start map by walking bodies in hierarchy (index)
        // order and accumulating dofCount — matches the ordering of
        // Get/SetJointPositions' reduced-coordinate list regardless of fixed
        // links interleaved by the URDF import.
        var bodies = GetComponentsInChildren<ArticulationBody>();
        System.Array.Sort(bodies, (a, b) => a.index.CompareTo(b.index));
        int dofStart = 0;
        foreach (var body in bodies)
        {
            int slot = System.Array.IndexOf(MjpcJointNames, body.name);
            if (slot >= 0) jointDofStart[slot] = dofStart;
            dofStart += body.dofCount;
        }
        if (jointDofStart.Count != NumHandJoints)
            Debug.LogWarning(
                $"RenderServerAgent resolved {jointDofStart.Count}/{NumHandJoints} hand joints by name");
    }

    public override void OnEpisodeBegin() { }

    public override void CollectObservations(VectorSensor sensor) { }

    static void ApplyPose(Transform target, ActionSegment<float> a, int at)
    {
        target.localPosition = new Vector3(a[at], a[at + 1], a[at + 2]);
        var q = new Quaternion(a[at + 3], a[at + 4], a[at + 5], a[at + 6]);
        target.localRotation = Normalized(q);
    }

    static Quaternion Normalized(Quaternion q)
    {
        float n = Mathf.Sqrt(q.x * q.x + q.y * q.y + q.z * q.z + q.w * q.w);
        if (n < 1e-8f) return Quaternion.identity;
        return new Quaternion(q.x / n, q.y / n, q.z / n, q.w / n);
    }

    public override void OnActionReceived(ActionBuffers actions)
    {
        var a = actions.ContinuousActions;
        if (a.Length != ActionSize)
        {
            Debug.LogError($"RenderServerAgent expects {ActionSize} actions, got {a.Length}");
            EndEpisode();
            return;
        }

        ApplyPose(camera1.transform, a, Cam1Pose);
        camera1.backgroundColor = new Color(a[Cam1Rgb], a[Cam1Rgb + 1], a[Cam1Rgb + 2]);
        ApplyPose(camera2.transform, a, Cam2Pose);
        camera2.backgroundColor = new Color(a[Cam2Rgb], a[Cam2Rgb + 1], a[Cam2Rgb + 2]);
        ApplyPose(cubeBody.transform, a, CubePose);

        // Light: position from the action; orientation = look-at-cube composed
        // with the action quaternion as a DELTA rotation (domain randomization
        // jitters the light direction about the cube-facing nominal).
        sceneLight.transform.localPosition =
            new Vector3(a[LightPose], a[LightPose + 1], a[LightPose + 2]);
        var toCube = cubeBody.transform.position - sceneLight.transform.position;
        var delta = Normalized(new Quaternion(
            a[LightPose + 3], a[LightPose + 4], a[LightPose + 5], a[LightPose + 6]));
        sceneLight.transform.rotation = delta * Quaternion.LookRotation(toCube);

        // Hand joints: read the FULL reduced-coordinate list (SetJointPositions
        // requires the articulation's total dof count), overwrite the named
        // finger dofs with the MJPC-ordered targets, write back.
        var joints = new List<float>();
        handRoot.GetJointPositions(joints);
        foreach (var pair in jointDofStart)
            joints[pair.Value] = a[HandJoints + pair.Key];
        handRoot.SetJointPositions(joints);

        SetReward(1f);   // unused; the "reward" is the rendered observation
        EndEpisode();    // one action == one episode (batch-renderer protocol)
    }

    public override void Heuristic(in ActionBuffers actionsOut)
    {
        // standalone debugging without the Python driver: random scene states,
        // colors constrained to [0, 1]
        var a = actionsOut.ContinuousActions;
        for (int i = 0; i < a.Length; i++)
        {
            bool isColor = (i >= Cam1Rgb && i < Cam1Rgb + 3) || (i >= Cam2Rgb && i < Cam2Rgb + 3);
            a[i] = isColor ? Random.Range(0f, 1f) : Random.Range(-0.3f, 0.3f);
        }
    }
}
