classdef Layer < handle
  % caffe.Layer — one layer of a net; exposes its parameter blobs and type
  % string. matcaffe API parity: matlab/+caffe/Layer.m.

  properties (Access = private)
    hLayer_self
    attributes
  end
  properties (SetAccess = private)
    params
  end

  methods
    function self = Layer(hLayer_layer)
      CHECK(is_valid_handle(hLayer_layer), 'invalid Layer handle');
      self.hLayer_self = hLayer_layer;
      self.attributes = caffe_('layer_get_attr', hLayer_layer);
      self.params = caffe.Blob.empty();
      for k = 1:numel(self.attributes.hBlob_blobs)
        self.params(k) = caffe.Blob(self.attributes.hBlob_blobs(k));
      end
    end

    function layer_type = type(self)
      layer_type = caffe_('layer_get_type', self.hLayer_self);
    end
  end
end
