classdef Layer < handle
  % caffe.Layer — one layer of a net; exposes its parameter blobs and type
  % string. matcaffe API parity: matlab/+caffe/Layer.m.

  properties (Access = private)
    self_id     % gateway handle struct for this layer
  end
  properties (SetAccess = private)
    params      % caffe.Blob array over the layer's weight blobs
  end

  methods
    function self = Layer(layer_id)
      CHECK(is_valid_handle(layer_id), 'invalid Layer handle');
      self.self_id = layer_id;
      % wrap each weight-blob handle the gateway reports for this layer;
      % fill back-to-front so the array is allocated once
      blob_ids = caffe_('layer_get_attr', layer_id).hBlob_blobs;
      self.params = caffe.Blob.empty();
      for i = numel(blob_ids):-1:1
        self.params(i) = caffe.Blob(blob_ids(i));
      end
    end

    function layer_type = type(self)
      layer_type = caffe_('layer_get_type', self.self_id);
    end
  end
end
