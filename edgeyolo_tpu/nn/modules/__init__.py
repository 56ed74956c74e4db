"""Layer zoo public surface."""

from edgeyolo_tpu.nn.modules.conv import (
    CBAM,
    ChannelAttention,
    Concat,
    Conv,
    Conv2d,
    ConvBN,
    ConvTranspose,
    DSConv,
    DWConv,
    Focus,
    GhostConv,
    Identity,
    Index,
    LightConv,
    SpatialAttention,
    MaxPool2d,
    Upsample,
    ZeroPad2d,
    autopad,
)
from edgeyolo_tpu.nn.modules.block import (
    C1,
    C2,
    C2f,
    C2fPSA,
    C2PSA,
    C3,
    C3k,
    C3k2,
    C3x,
    PSA,
    SCDown,
    SPP,
    SPPF,
    Attention,
    Bottleneck,
    PSABlock,
    Proto,
    dfl_decode,
)
from edgeyolo_tpu.nn.modules.edgeline import (
    DWT2D,
    RHJM,
    C2PSA_LinearAttention,
    C3k2_Wavelet,
    DSBottleneck,
    DSC3k,
    DSC3K2,
    DSC3K2_Wavelet,
    LinearAttention,
    MulGate,
    PSABlockLinearAttention,
    SPPF_Wavelet,
    WaveletEnhancer,
)
from edgeyolo_tpu.nn.modules.head import (
    OBB,
    Classify,
    Pose,
    Segment,
    Detect,
    E2EDetect,
    GF2Detect,
    GFLHeadv2_E2E,
    GFLHeadv2_uniH,
    RTDETRDecoder,
    v10Detect,
)

__all__ = [n for n in dir() if not n.startswith("_")]

from edgeyolo_tpu.nn.modules.transformer import (  # noqa: E402
    AIFI,
    MLP,
    DeformableTransformerDecoder,
    DeformableTransformerDecoderLayer,
    LayerNorm2d,
    MSDeformAttn,
    RepC3,
    TransformerEncoderLayer,
)
from edgeyolo_tpu.nn.modules.extra import (  # noqa: E402
    A2C2f,
    AAttn,
    ABlock,
    AConv,
    ADown,
    AdaHGComputation,
    AdaHGConv,
    AdaHyperedgeGen,
    BottleneckCSP,
    C2fCIB,
    C3AH,
    C3Ghost,
    CBFuse,
    CBLinear,
    CIB,
    DownsampleConv,
    DySample,
    ELAN1,
    FullPAD_Tunnel,
    FuseModule,
    GhostBottleneck,
    HGBlock,
    HGStem,
    HyperACE,
    RepConv,
    RepNCSP,
    RepNCSPELAN4,
    RepVGGDW,
    ResNetLayer,
    SPPELAN,
    WTConv2d,
)

__all__ = [n for n in dir() if not n.startswith("_")]

from edgeyolo_tpu.nn.modules.world import (  # noqa: E402
    BNContrastiveHead,
    C2fAttn,
    ContrastiveHead,
    ImagePoolingAttn,
    MaxSigmoidAttnBlock,
    WorldDetect,
)

__all__ = [n for n in dir() if not n.startswith("_")]

from edgeyolo_tpu.nn.modules.msla_lgl import (  # noqa: E402
    C3AW_MLM,
    DSC3K2_LGL,
    DSC3K2_MSLA,
    GlobalSparseAttn,
    HyperACE_Wavelet,
    IHaarDWT2D,
    LGLBlock,
    LocalAgg,
    LocalSS2DContext,
    MSLA,
    SeqMixer1D,
    Wavelet_SS2D,
    WaveletMixerMultiLevel,
)

__all__ = [n for n in dir() if not n.startswith("_")]
from edgeyolo_tpu.nn.modules.activation import AGLU, TeLU, telu  # noqa: E402,F401
