from .attributes import Attribute, AttributeSpec, AttributeScaler
