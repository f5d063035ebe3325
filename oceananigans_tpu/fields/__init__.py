from .field import (Field, CenterField, XFaceField, YFaceField, ZFaceField,
                    VelocityFields, TracerFields, set_on_padded)

__all__ = ["Field", "CenterField", "XFaceField", "YFaceField", "ZFaceField",
           "VelocityFields", "TracerFields", "set_on_padded"]
