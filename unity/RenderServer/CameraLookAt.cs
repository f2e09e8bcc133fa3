// Keeps a camera (or any transform) aimed at a target every frame — used for
// scene-authoring convenience so randomized camera mounts stay pointed at the
// workspace (reference behavior: LeapProject/Assets/lookAtOrigin.cs, which
// hard-codes the origin; this version exposes the target).

using UnityEngine;

public class CameraLookAt : MonoBehaviour
{
    [SerializeField] Transform target;          // defaults to the world origin
    [SerializeField] Vector3 fallbackPoint = Vector3.zero;

    void LateUpdate()
    {
        transform.LookAt(target != null ? target.position : fallbackPoint);
    }
}
