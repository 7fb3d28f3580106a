classdef test_io < matlab.unittest.TestCase
  % io facade tests: mean file round trip through the BlobProto container.

  methods (Test)
    function test_read_write_mean(self)
      % a random W x H x C single image must survive the
      % write_mean -> .binaryproto -> read_mean round trip bit-exactly
      proto_path = tempname();
      written = 255 * rand(200, 300, 3, 'single');
      caffe.io.write_mean(written, proto_path);
      self.verifyEqual(written, caffe.io.read_mean(proto_path));
      delete(proto_path);
    end
  end
end
