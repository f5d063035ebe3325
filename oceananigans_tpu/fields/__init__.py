from .field import (Field, CenterField, XFaceField, YFaceField, ZFaceField,
                    VelocityFields, TracerFields, set_on_padded)
from .function_field import (FunctionField, ConstantField, ZeroField,
                             OneField, GridMetricOperation, interpolate)

__all__ = ["Field", "CenterField", "XFaceField", "YFaceField", "ZFaceField",
           "VelocityFields", "TracerFields", "set_on_padded",
           "FunctionField", "ConstantField", "ZeroField", "OneField",
           "GridMetricOperation", "interpolate"]
