from mcalf_tpu.ops.faddeeva import erfcx, hjert, wofz_real_916, wofz_real_asym

__all__ = ["erfcx", "hjert", "wofz_real_916", "wofz_real_asym"]
