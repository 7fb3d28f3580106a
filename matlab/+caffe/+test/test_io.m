classdef test_io < matlab.unittest.TestCase
  % io facade tests: mean file round trip through the BlobProto container.

  methods (Test)
    function test_read_write_mean(self)
      mean_data_write = 255 * rand(200, 300, 3, 'single');
      mean_proto_file = tempname();
      caffe.io.write_mean(mean_data_write, mean_proto_file);
      self.verifyEqual(mean_data_write, caffe.io.read_mean(mean_proto_file));
      delete(mean_proto_file);
    end
  end
end
