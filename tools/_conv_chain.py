"""The pure conv chain used by the round-3 chain-backward study — ONE
definition shared by tools/perf_wave_ablate.py (convonly / convprobe /
convbarrier stages) and tools/dump_conv_hlo.py so every probe measures
the same graph: layer 0 as an im2col matmul (C_in=1 has no MXU
contraction), layers 1+ as NHC convs, NO norm / NO GELU."""


def conv_chain(fe, conv_layers, x, n=None, barrier_where=None):
    """x (B, T_wave) -> (B, T_frames, C) through the first ``n`` layers.

    ``barrier_where``: None, "all", or an iterable of layer indices after
    which to insert jax.lax.optimization_barrier.
    """
    import jax

    from speech_ssl_compression_tpu.models.conv_frontend import (
        _im2col_matmul,
    )

    if n is None:
        n = len(conv_layers)
    x = x[:, :, None]
    for i, (layer, (dim, k, stride)) in enumerate(
            zip(fe[:n], conv_layers[:n])):
        w = layer["weight"]
        if i == 0:
            x = _im2col_matmul(x, w, k, stride)
        else:
            x = jax.lax.conv_general_dilated(
                x, w.transpose(2, 1, 0).astype(x.dtype),
                window_strides=(stride,), padding="VALID",
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if barrier_where == "all" or (
                barrier_where is not None and i in barrier_where):
            x = jax.lax.optimization_barrier(x)
    return x
