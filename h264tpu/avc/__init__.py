"""Standard-conformant H.264/AVC coding layer.

Unlike the FVC fractal container (the framework's own format), everything in
this package emits/consumes REAL H.264 syntax (ITU-T H.264 / ISO 14496-10):
Annex-B streams that JM 18.5 ``ldecod`` decodes bit-exactly.  Reference
semantics: encoder ``JM/lencod/src/{macroblock,slice,vlc,block}.c``, decode
twin ``JM/ldecod/src/{mb_read,read_comp_cavlc,block}.c`` (SURVEY §2.2 J1-J9,
§3.4/3.5 call stacks).

The conformance model here is the host-side reference implementation
(numpy, MB raster order exactly as the spec requires); the batched TPU
wavefront kernels in ``ops/`` are validated against it.
"""
