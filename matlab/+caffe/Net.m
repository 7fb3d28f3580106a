classdef Net < handle
  % caffe.Net — MATLAB facade over one deepcut_tpu graph-engine net.
  % Drop-in matcaffe API (reference: matlab/+caffe/Net.m); every call is
  % forwarded through the caffe_ MEX gateway to the Python command
  % dispatcher, so the semantics are exactly pycaffe's.
  %
  % Arrays cross the boundary as MATLAB singles in reversed (W x H x C x N)
  % dimension order — the same bytes as Caffe's row-major N x C x H x W.

  properties (Access = private)
    hNet_self
    attributes
  end
  properties (SetAccess = private)
    layer_vec
    blob_vec
    inputs
    outputs
    name2layer_index
    name2blob_index
    layer_names
    blob_names
  end

  methods
    function self = Net(varargin)
      if nargin ~= 1 || ~isstruct(varargin{1})
        % called with file names: defer to the factory, which loops back
        % here with a handle
        self = caffe.get_net(varargin{:});
        return
      end
      h = varargin{1};
      CHECK(is_valid_handle(h), 'invalid Net handle');
      self.hNet_self = h;
      self.attributes = caffe_('net_get_attr', h);
      a = self.attributes;

      self.layer_vec = caffe.Layer.empty();
      for k = 1:numel(a.hLayer_layers)
        self.layer_vec(k) = caffe.Layer(a.hLayer_layers(k));
      end
      self.blob_vec = caffe.Blob.empty();
      for k = 1:numel(a.hBlob_blobs)
        self.blob_vec(k) = caffe.Blob(a.hBlob_blobs(k));
      end

      % gateway indices are 0-based; MATLAB cells are 1-based
      self.inputs = a.blob_names(a.input_blob_indices + 1);
      self.outputs = a.blob_names(a.output_blob_indices + 1);
      self.name2layer_index = ...
        containers.Map(a.layer_names, 1:numel(a.layer_names));
      self.name2blob_index = ...
        containers.Map(a.blob_names, 1:numel(a.blob_names));
      self.layer_names = a.layer_names;
      self.blob_names = a.blob_names;
    end

    function layer = layers(self, layer_name)
      CHECK(ischar(layer_name), 'layer_name must be a string');
      layer = self.layer_vec(self.name2layer_index(layer_name));
    end

    function blob = blobs(self, blob_name)
      CHECK(ischar(blob_name), 'blob_name must be a string');
      blob = self.blob_vec(self.name2blob_index(blob_name));
    end

    function blob = params(self, layer_name, blob_index)
      CHECK(ischar(layer_name), 'layer_name must be a string');
      CHECK(isscalar(blob_index), 'blob_index must be a scalar');
      blob = self.layers(layer_name).params(blob_index);
    end

    function forward_prefilled(self)
      % run with whatever is already staged in the input blobs
      caffe_('net_forward', self.hNet_self);
    end

    function backward_prefilled(self)
      caffe_('net_backward', self.hNet_self);
    end

    function res = forward(self, input_data)
      % res = forward(self, input_data): stage one cell per input blob,
      % run, and collect one cell per output blob
      CHECK(iscell(input_data), 'input_data must be a cell array');
      CHECK(numel(input_data) == numel(self.inputs), ...
        'input data cell length must match input blob number');
      for k = 1:numel(self.inputs)
        self.blobs(self.inputs{k}).set_data(input_data{k});
      end
      self.forward_prefilled();
      res = cellfun(@(nm) self.blobs(nm).get_data(), ...
        self.outputs(:), 'UniformOutput', false);
    end

    function res = backward(self, output_diff)
      % res = backward(self, output_diff): inject cotangents on every
      % output blob, run backward, and collect the input-blob diffs
      CHECK(iscell(output_diff), 'output_diff must be a cell array');
      CHECK(numel(output_diff) == numel(self.outputs), ...
        'output diff cell length must match output blob number');
      for k = 1:numel(self.outputs)
        self.blobs(self.outputs{k}).set_diff(output_diff{k});
      end
      self.backward_prefilled();
      res = cellfun(@(nm) self.blobs(nm).get_diff(), ...
        self.inputs(:), 'UniformOutput', false);
    end

    function copy_from(self, weights_file)
      % load trained layers from a .caffemodel / .caffemodel.h5
      CHECK(ischar(weights_file), 'weights_file must be a string');
      CHECK_FILE_EXIST(weights_file);
      caffe_('net_copy_from', self.hNet_self, weights_file);
    end

    function reshape(self)
      caffe_('net_reshape', self.hNet_self);
    end

    function save(self, weights_file)
      CHECK(ischar(weights_file), 'weights_file must be a string');
      caffe_('net_save', self.hNet_self, weights_file);
    end
  end
end
