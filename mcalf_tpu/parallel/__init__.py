from mcalf_tpu.parallel.fleet import fit_many, fit_stacked, make_mesh

__all__ = ["fit_many", "fit_stacked", "make_mesh"]
