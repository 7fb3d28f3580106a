classdef Blob < handle
  % caffe.Blob — view onto one activation or parameter blob, addressed by
  % gateway handle. matcaffe API parity: matlab/+caffe/Blob.m. All data is
  % exchanged as single precision in MATLAB (W-fastest) dimension order.

  properties (Access = private)
    hBlob_self
  end

  methods
    function self = Blob(hBlob_blob)
      CHECK(is_valid_handle(hBlob_blob), 'invalid Blob handle');
      self.hBlob_self = hBlob_blob;
    end

    function shape = shape(self)
      shape = caffe_('blob_get_shape', self.hBlob_self);
    end

    function reshape(self, shape)
      CHECK(isempty(shape) || (isnumeric(shape) && isrow(shape)), ...
        'shape must be a integer row vector');
      caffe_('blob_reshape', self.hBlob_self, double(shape));
    end

    function data = get_data(self)
      data = caffe_('blob_get_data', self.hBlob_self);
    end

    function set_data(self, data)
      caffe_('blob_set_data', self.hBlob_self, self.as_payload(data));
    end

    function diff = get_diff(self)
      diff = caffe_('blob_get_diff', self.hBlob_self);
    end

    function set_diff(self, diff)
      caffe_('blob_set_diff', self.hBlob_self, self.as_payload(diff));
    end
  end

  methods (Access = private)
    function data = as_payload(self, data)
      % validate dtype + shape and coerce to single before crossing the
      % MEX boundary
      CHECK(isnumeric(data), 'data or diff must be numeric types');
      want = self.shape;
      % MATLAB squeezes trailing singleton dims past 2 and pads below 2;
      % normalise both sides before comparing
      if numel(want) < 2
        want = [want, ones(1, 2 - numel(want))];
      end
      have = [size(data), ones(1, numel(want) - ndims(data))];
      CHECK(numel(want) == numel(have) && all(want == have), ...
        sprintf(['input data/diff size does not match target blob ' ...
        'shape, input data/diff size: [ %s] vs target blob shape: ' ...
        '[ %s]'], sprintf('%d ', have), sprintf('%d ', want)));
      if ~isa(data, 'single')
        data = single(data);
      end
    end
  end
end
