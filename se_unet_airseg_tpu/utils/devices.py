"""Device enumeration — the reference's pynvml free-memory polling
(reference util.py:78-91, test.py:273-283, weight_br.py:208-240) has
no TPU analog: slices are dedicated, so `pick_devices` just returns
the first N jax devices and raises when the slice is too small."""

from __future__ import annotations


def pick_devices(n: int = 1, min_hbm_gb: float = 0.0):
    import jax

    devs = jax.devices()
    if len(devs) < n:
        raise RuntimeError(f"need {n} devices, have {len(devs)}")
    return devs[:n]


def device_summary() -> str:
    import jax

    return ", ".join(f"{d.platform}:{d.id}" for d in jax.devices())
